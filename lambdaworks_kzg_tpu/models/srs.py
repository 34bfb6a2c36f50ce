"""Trusted setup (SRS) loading, conversion and caching.

Behavioral parity with reference src/srs.rs:25-128 (text format
`n1\nn2\n<hex...>`) and reference src/lib.rs:709-802 (byte-array and FILE*
variants), plus the missing-from-the-reference FFT conversion pipeline
(commented out at reference src/lib.rs:760-770): the file stores G1 powers
in *monomial* form; the protocol needs `brp(ifft_g1(monomial))` — the
bit-reversed Lagrange basis — which is what the consensus-spec vectors
assume.

Unlike the reference, which re-converts the whole 4096-point table on every
API call (reference src/srs.rs:258-280), we convert once at load time and
keep the result as device-resident arrays (see models/kzg.py); the host copy
here is the exact oracle. Conversion results are cached on disk keyed by the
file content hash.
"""

import hashlib
import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..constants import (
    NUM_G2_POINTS,
    TRUSTED_SETUP_NUM_G1_POINTS,
)
from ..host import curve as C
from ..host import fft as FFT

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "cache")

AffineG1 = Optional[Tuple[int, int]]  # None == infinity


@dataclass
class TrustedSetup:
    """Loaded and converted SRS.

    g1_lagrange_brp : 4096 affine G1 points, bit-reversed Lagrange basis
                      (commitment basis for evaluation-form blobs)
    g1_monomial     : 4096 affine G1 points, monomial basis [s^i]G
    g2_monomial     : 65 affine G2 points, monomial basis [s^i]G2
                      (only indices 0 and 1 are used by the protocol,
                      mirroring reference src/srs.rs:254,274)
    """

    g1_lagrange_brp: List[AffineG1]
    g1_monomial: List[AffineG1]
    g2_monomial: List[Optional[Tuple[tuple, tuple]]]
    source_digest: str

    @property
    def n(self) -> int:
        return len(self.g1_lagrange_brp)


class SetupLoadError(ValueError):
    pass


def _parse_setup_text(text: str) -> Tuple[List[bytes], List[bytes]]:
    lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
    if len(lines) < 2:
        raise SetupLoadError("missing headers")
    try:
        n1, n2 = int(lines[0]), int(lines[1])
    except ValueError as e:
        raise SetupLoadError(f"bad headers: {e}") from e
    if len(lines) != 2 + n1 + n2:
        raise SetupLoadError("line count mismatch")
    try:
        g1 = [bytes.fromhex(ln) for ln in lines[2 : 2 + n1]]
        g2 = [bytes.fromhex(ln) for ln in lines[2 + n1 :]]
    except ValueError as e:
        raise SetupLoadError(f"bad hex: {e}") from e
    if any(len(b) != 48 for b in g1) or any(len(b) != 96 for b in g2):
        raise SetupLoadError("bad point byte length")
    return g1, g2


def _affine_g1_to_u8(points: List[AffineG1]) -> np.ndarray:
    """Pack affine points to uint8[n, 97]: flag || x(48) || y(48)."""
    out = np.zeros((len(points), 97), dtype=np.uint8)
    for i, pt in enumerate(points):
        if pt is None:
            continue
        out[i, 0] = 1
        out[i, 1:49] = np.frombuffer(pt[0].to_bytes(48, "big"), dtype=np.uint8)
        out[i, 49:] = np.frombuffer(pt[1].to_bytes(48, "big"), dtype=np.uint8)
    return out


def _affine_g1_from_u8(arr: np.ndarray) -> List[AffineG1]:
    out: List[AffineG1] = []
    for row in arr:
        if row[0] == 0:
            out.append(None)
        else:
            out.append(
                (
                    int.from_bytes(row[1:49].tobytes(), "big"),
                    int.from_bytes(row[49:].tobytes(), "big"),
                )
            )
    return out


def _affine_g2_to_u8(points) -> np.ndarray:
    """Pack affine G2 points to uint8[n, 193]: flag || x0 x1 y0 y1 (48B each)."""
    out = np.zeros((len(points), 193), dtype=np.uint8)
    for i, pt in enumerate(points):
        if pt is None:
            continue
        out[i, 0] = 1
        (x0, x1), (y0, y1) = pt
        for j, v in enumerate((x0, x1, y0, y1)):
            out[i, 1 + 48 * j : 1 + 48 * (j + 1)] = np.frombuffer(
                v.to_bytes(48, "big"), dtype=np.uint8
            )
    return out


def _affine_g2_from_u8(arr: np.ndarray):
    out = []
    for row in arr:
        if row[0] == 0:
            out.append(None)
        else:
            vs = [
                int.from_bytes(row[1 + 48 * j : 1 + 48 * (j + 1)].tobytes(), "big")
                for j in range(4)
            ]
            out.append(((vs[0], vs[1]), (vs[2], vs[3])))
    return out


def load_trusted_setup_from_bytes(
    g1_bytes: List[bytes],
    g2_bytes: List[bytes],
    use_cache: bool = True,
    strict_counts: bool = True,
) -> TrustedSetup:
    """Decompress + convert an SRS given compressed point byte strings.

    Parity: reference load_trusted_setup (src/lib.rs:709-776) which enforces
    exact counts and returns BADARGS otherwise.
    """
    if strict_counts and (
        len(g1_bytes) != TRUSTED_SETUP_NUM_G1_POINTS
        or len(g2_bytes) != NUM_G2_POINTS
    ):
        raise SetupLoadError("bad point counts")
    n1 = len(g1_bytes)
    if n1 & (n1 - 1) != 0:
        raise SetupLoadError("g1 count must be a power of two")

    digest = hashlib.sha256(
        b"".join(g1_bytes) + b"|" + b"".join(g2_bytes)
    ).hexdigest()
    cache_path = os.path.join(_CACHE_DIR, f"srs_{digest[:16]}.npz")
    if use_cache and os.path.exists(cache_path):
        return _setup_from_cache(cache_path, digest)

    g2_points = _decompress_g2_list(g2_bytes)
    converted = _convert_g1_device(g1_bytes) if _device_worthwhile(n1) else None
    if converted is not None:
        monomial, lagrange = converted
    else:
        ops = C.FP_OPS
        monomial_jac = []
        for b in g1_bytes:
            try:
                monomial_jac.append(C.decompress_g1(b, subgroup_check=True))
            except C.DeserializationError as e:
                raise SetupLoadError(f"bad g1 point: {e}") from e
        lagrange_jac = FFT.bit_reversal_permutation(
            FFT.g1_fft(monomial_jac, inverse=True)
        )
        monomial = [C.to_affine(ops, pt) for pt in monomial_jac]
        lagrange = [C.to_affine(ops, pt) for pt in lagrange_jac]

    if use_cache:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        np.savez_compressed(
            cache_path,
            lagrange=_affine_g1_to_u8(lagrange),
            monomial=_affine_g1_to_u8(monomial),
            g2=_affine_g2_to_u8(g2_points),
        )
    return TrustedSetup(
        g1_lagrange_brp=lagrange,
        g1_monomial=monomial,
        g2_monomial=g2_points,
        source_digest=digest,
    )


def _setup_from_cache(cache_path: str, digest: str) -> TrustedSetup:
    data = np.load(cache_path)
    return TrustedSetup(
        g1_lagrange_brp=_affine_g1_from_u8(data["lagrange"]),
        g1_monomial=_affine_g1_from_u8(data["monomial"]),
        g2_monomial=_affine_g2_from_u8(data["g2"]),
        source_digest=digest,
    )


def _decompress_g2_list(g2_bytes):
    out = []
    for b in g2_bytes:
        try:
            pt = C.decompress_g2(b, subgroup_check=True)
        except C.DeserializationError as e:
            raise SetupLoadError(f"bad g2 point: {e}") from e
        out.append(C.to_affine(C.FP2_OPS, pt))
    return out


def _device_worthwhile(n: int) -> bool:
    """Use the batched device conversion pipeline on real TPUs for large
    setups (4096 host decompressions + the G1 group-FFT take ~2 min on
    host; seconds on chip)."""
    if n < 256:
        return False
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _convert_g1_device(g1_bytes: List[bytes]):
    """Batched on-device decompress + inverse group-FFT + bit reversal.

    Bit-identical to the host path (same formulas, same Montgomery
    arithmetic); returns (monomial, lagrange_brp) affine host lists, or
    raises SetupLoadError on any bad point.
    """
    import jax.numpy as jnp
    import numpy as _np

    from ..host import fft as _fft
    from ..ops import g1_batch

    pts_aff, is_inf, err = g1_batch.decompress_batch(g1_bytes)
    if err.any():
        raise SetupLoadError(
            f"bad g1 point at index {int(_np.argmax(err))}"
        )
    valid = ~_np.asarray(is_inf)
    jac = g1_batch.lift_affine(pts_aff, jnp.asarray(valid))
    lagrange_jac = g1_batch.g1_fft_device(jac, inverse=True)
    brp = jnp.asarray(
        _np.asarray(_fft.bit_reversal_permutation(list(range(len(g1_bytes))))),
        dtype=jnp.int32,
    )
    lagrange_brp = jnp.take(lagrange_jac, brp, axis=-1)
    monomial = g1_batch.jacobians_to_host_affine(jac)
    lagrange = g1_batch.jacobians_to_host_affine(lagrange_brp)
    return monomial, lagrange


def create_dev_setup(n: int = 64, secret: Optional[int] = None) -> TrustedSetup:
    """Generate a small insecure dev SRS (parity: reference `create_srs`,
    src/utils.rs:84-107, which draws a random toxic waste).

    Produces n monomial G1 powers [s^i]G, the bit-reversed Lagrange basis,
    and NUM_G2_POINTS G2 powers (protocol uses only [1]_2 and [s]_2,
    reference src/srs.rs:254,274). Deterministic when `secret` is given.
    """
    import secrets as _secrets

    from ..constants import R

    if n & (n - 1) != 0 or n < 2:
        raise SetupLoadError("n must be a power of two >= 2")
    s = (secret if secret is not None else _secrets.randbelow(R - 2) + 1) % R
    ops, ops2 = C.FP_OPS, C.FP2_OPS
    monomial_jac, acc = [], 1
    for _ in range(n):
        monomial_jac.append(C.point_scalar_mul(ops, C.G1_GENERATOR, acc))
        acc = acc * s % R
    g2_points, acc = [], 1
    for _ in range(2):  # protocol uses only [1]_2 and [s]_2
        g2_points.append(
            C.to_affine(ops2, C.point_scalar_mul(ops2, C.G2_GENERATOR, acc))
        )
        acc = acc * s % R
    lagrange_jac = FFT.bit_reversal_permutation(FFT.g1_fft(monomial_jac, inverse=True))
    return TrustedSetup(
        g1_lagrange_brp=[C.to_affine(ops, pt) for pt in lagrange_jac],
        g1_monomial=[C.to_affine(ops, pt) for pt in monomial_jac],
        g2_monomial=g2_points,
        source_digest=f"dev-{n}",
    )


def load_trusted_setup_file(path: str, use_cache: bool = True) -> TrustedSetup:
    """Parity: reference load_trusted_setup_file (src/lib.rs:779-802 +
    src/srs.rs:99-128), plus the FFT conversion the reference omitted."""
    with open(path, "r", encoding="utf-8") as f:
        g1_bytes, g2_bytes = _parse_setup_text(f.read())
    return load_trusted_setup_from_bytes(
        g1_bytes, g2_bytes, use_cache=use_cache, strict_counts=False
    )


_REFERENCE_SETUP_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "testdata", "trusted_setup.txt"),
    "/root/reference/tests/trusted_setup.txt",
]


_MAINNET_CACHE = os.path.join(_CACHE_DIR, "srs_mainnet.npz")


def load_mainnet_setup(use_cache: bool = True) -> TrustedSetup:
    for p in _REFERENCE_SETUP_PATHS:
        if os.path.exists(p):
            setup = load_trusted_setup_file(p, use_cache=use_cache)
            if use_cache and not os.path.exists(_MAINNET_CACHE):
                src = os.path.join(
                    _CACHE_DIR, f"srs_{setup.source_digest[:16]}.npz"
                )
                if os.path.exists(src):
                    import shutil

                    shutil.copyfile(src, _MAINNET_CACHE)
            return setup
    # standalone fallback: the repo-committed converted cache
    if os.path.exists(_MAINNET_CACHE):
        return _setup_from_cache(_MAINNET_CACHE, "mainnet-cache")
    raise SetupLoadError("no mainnet trusted setup file found")
