"""ctypes binding for the native C++ tier (native/bls12_381.cpp).

Pairing checks and subgroup tests are latency-bound single-point ops —
the wrong shape for TPU vector lanes and ~100x too slow in Python ints.
The native tier mirrors the host oracle's formulas one-to-one and is
differential-tested against it (tests/test_native.py).

LWKZG_NATIVE=0 disables (falls back to the pure-Python oracle).
"""

import ctypes
import os
import subprocess
from typing import Optional

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
# LWKZG_NATIVE_LIB points the loader at an alternate build of the same
# ABI — used by `make native-asan` to run the test suite against the
# ASan+UBSan-instrumented library.
_LIB_PATH = os.environ.get("LWKZG_NATIVE_LIB") or os.path.join(
    _NATIVE_DIR, "libbls12381_native.so"
)

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("LWKZG_NATIVE") == "0":
        return None
    import sys

    try:
        if not os.path.exists(_LIB_PATH):
            print(
                "[lambdaworks_kzg_tpu] building native tier "
                f"(make -C {os.path.abspath(_NATIVE_DIR)}) ...",
                file=sys.stderr,
            )
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=300,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.lw_init.restype = ctypes.c_int
        lib.lw_pairings_verify.restype = ctypes.c_int
        lib.lw_g1_in_subgroup.restype = ctypes.c_int
        lib.lw_g2_in_subgroup.restype = ctypes.c_int
        lib.lw_g1_scalar_mul.restype = ctypes.c_int
        lib.lw_g2_scalar_mul.restype = ctypes.c_int
        lib.lw_blob_eval.restype = ctypes.c_int
        lib.lw_g1_decompress.restype = ctypes.c_int
        lib.lw_g1_msm.restype = ctypes.c_int
        if lib.lw_init() != 0:
            print(
                "[lambdaworks_kzg_tpu] native tier self-check failed; "
                "falling back to the pure-Python oracle (slow). "
                "Set LWKZG_NATIVE=0 to silence.",
                file=sys.stderr,
            )
            return None
        _lib = lib
    except Exception as e:
        print(
            f"[lambdaworks_kzg_tpu] native tier unavailable ({e!r}); "
            f"falling back to the pure-Python oracle (slow). "
            f"Run `make -C {os.path.abspath(_NATIVE_DIR)}` to build it, "
            "or set LWKZG_NATIVE=0 to silence.",
            file=sys.stderr,
        )
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _g1_bytes(aff) -> bytes:
    x, y = aff
    return x.to_bytes(48, "big") + y.to_bytes(48, "big")


def _g2_bytes(aff) -> bytes:
    (x0, x1), (y0, y1) = aff
    return (
        x0.to_bytes(48, "big")
        + x1.to_bytes(48, "big")
        + y0.to_bytes(48, "big")
        + y1.to_bytes(48, "big")
    )


def pairings_verify_affine(a1, a2, b1, b2) -> bool:
    """e(a1, a2) == e(b1, b2) for affine tuples (None = infinity)."""
    lib = _load()
    assert lib is not None
    r = lib.lw_pairings_verify(
        _g1_bytes(a1) if a1 else b"\x00" * 96,
        1 if a1 is None else 0,
        _g2_bytes(a2) if a2 else b"\x00" * 192,
        1 if a2 is None else 0,
        _g1_bytes(b1) if b1 else b"\x00" * 96,
        1 if b1 is None else 0,
        _g2_bytes(b2) if b2 else b"\x00" * 192,
        1 if b2 is None else 0,
    )
    return r == 1


def g1_in_subgroup_affine(aff) -> bool:
    lib = _load()
    assert lib is not None
    return lib.lw_g1_in_subgroup(_g1_bytes(aff)) == 1


def g2_in_subgroup_affine(aff) -> bool:
    lib = _load()
    assert lib is not None
    return lib.lw_g2_in_subgroup(_g2_bytes(aff)) == 1


def g2_scalar_mul_affine(aff, k: int):
    """[k]Q -> affine ((x0,x1),(y0,y1)) or None (infinity)."""
    lib = _load()
    assert lib is not None
    out = ctypes.create_string_buffer(192)
    inf = lib.lw_g2_scalar_mul(
        _g2_bytes(aff), (k % (1 << 256)).to_bytes(32, "big"), out
    )
    if inf:
        return None
    v = [int.from_bytes(out.raw[i * 48 : (i + 1) * 48], "big") for i in range(4)]
    return ((v[0], v[1]), (v[2], v[3]))


def blob_eval(blob: bytes, roots_brp_le: bytes, n: int, z: int) -> int:
    """Barycentric p(z) for an evaluation-form blob (host, no device RTT).

    roots_brp_le: the brp-ordered domain as n x 32-byte little-endian.
    Raises ValueError on a non-canonical blob element."""
    lib = _load()
    assert lib is not None
    from .constants import R

    out = ctypes.create_string_buffer(32)
    rc = lib.lw_blob_eval(
        blob,
        roots_brp_le,
        ctypes.c_size_t(n),
        (z % R).to_bytes(32, "little"),
        out,
    )
    if rc == 2:
        raise ValueError("non-canonical field element in blob (>= r)")
    if rc != 0:
        raise ValueError(f"blob_eval failed ({rc})")
    return int.from_bytes(out.raw[:32], "little")


def g1_scalar_mul_affine(aff, k: int):
    """[k]P -> affine tuple or None (infinity)."""
    lib = _load()
    assert lib is not None
    out = ctypes.create_string_buffer(96)
    inf = lib.lw_g1_scalar_mul(
        _g1_bytes(aff), (k % (1 << 256)).to_bytes(32, "big"), out
    )
    if inf:
        return None
    return (
        int.from_bytes(out.raw[:48], "big"),
        int.from_bytes(out.raw[48:96], "big"),
    )


def g1_decompress(data: bytes, subgroup_check: bool = True):
    """48-byte compressed G1 -> affine (x, y) tuple or None (infinity).

    The serving-latency decompression tier (~0.3 ms/point vs ~5 ms for the
    Python-int sqrt): exact parity with host/curve.decompress_g1,
    including the canonical-range, on-curve, and subgroup rejections.
    Raises ValueError with the same failure classes."""
    lib = _load()
    assert lib is not None
    if len(data) != 48:
        raise ValueError("bad length")
    out = ctypes.create_string_buffer(96)
    rc = lib.lw_g1_decompress(bytes(data), out, 1 if subgroup_check else 0)
    if rc == 1:
        return None
    if rc == -1:
        raise ValueError("bad encoding")
    if rc == -2:
        raise ValueError("x >= p")
    if rc == -3:
        raise ValueError("not on curve")
    if rc == -4:
        raise ValueError("not in subgroup")
    if rc != 0:
        raise ValueError(f"decompress failed ({rc})")
    return (
        int.from_bytes(out.raw[:48], "big"),
        int.from_bytes(out.raw[48:96], "big"),
    )


def g1_msm_affine(scalars, points_affine):
    """Small Pippenger MSM -> affine tuple or None (infinity).

    scalars: ints (reduced mod r by the caller); points: affine (x, y)
    tuples, None = infinity. The batch-verify lincomb tier (reference
    src/lib.rs:679-685): ~6 ms at 17 points vs ~50 ms for the
    Python-int MSM and ~60 ms for a device dispatch of that shape."""
    lib = _load()
    assert lib is not None
    n = len(points_affine)
    if len(scalars) != n:
        raise ValueError("length mismatch")
    sc = b"".join((int(s) % (1 << 256)).to_bytes(32, "big") for s in scalars)
    pts = bytearray(96 * n)
    infs = bytearray(n)
    for i, p in enumerate(points_affine):
        if p is None:
            infs[i] = 1
        else:
            pts[96 * i : 96 * i + 96] = _g1_bytes(p)
    out = ctypes.create_string_buffer(96)
    rc = lib.lw_g1_msm(n, sc, bytes(pts), bytes(infs), out)
    if rc == 1:
        return None
    if rc != 0:
        raise ValueError(f"msm failed ({rc})")
    return (
        int.from_bytes(out.raw[:48], "big"),
        int.from_bytes(out.raw[48:96], "big"),
    )
