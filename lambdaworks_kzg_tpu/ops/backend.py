"""DeviceBackend: the TPU execution tier behind models/kzg.KZG.

Holds the SRS as device-resident Montgomery limb arrays (created once —
fixing the reference's per-call SRS reconversion, src/srs.rs:258-380) and
routes commit / evaluate / quotient through the JAX kernels in ops/.
Bit-identical to models/kzg.HostBackend (the Python-int oracle); the
consensus vectors pass through either backend.

Multi-chip: pass a ``jax.sharding.Mesh`` with axes ``(data, points)``
(see parallel/mesh.make_mesh). MSM points shard over ``points`` (window
sums all_gather-ed over ICI and tree-combined with Jacobian adds); blob
batches shard over ``data``. The reference processes batches sequentially
on one thread (src/lib.rs:562-596); here every entry point transparently
runs the same kernels sharded — same bits out on any mesh shape.
"""

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..constants import R
from ..host import curve as HC
from . import fr_poly, g1_ops, limbs as lb, msm
from .field_ops import FR


def _auto_window(n: int) -> int:
    """Pippenger window size tuned for lane occupancy vs. bucket load.

    Any c is viable since the top-window alias split (ops/msm.py
    prepare_digits); the trade is members (W = ceil(256/c) gathers+madds
    per point) against bucket-load skew (max/mean grows as mean load
    n/2^c shrinks). Measured on v5e at 2^20: c=12 503k pts/s vs c=8
    420k, c=10 383k, c=13 414k; below ~2^18 the c=12 skew term
    dominates and c=8 wins.
    """
    if n <= 256:
        return 4
    if n >= (1 << 18):
        return 12
    return 8


def _ceil_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _fixed_base_enabled(flag, n: int) -> bool:
    """Fixed-base SRS tables: auto on real TPUs (where the one-time
    table build is cheap), opt-in/out via LWKZG_FIXED_BASE=1|0."""
    import os

    env = os.environ.get("LWKZG_FIXED_BASE")
    if env is not None:
        return env != "0"
    if flag is not None:
        return flag
    if n < 256:
        return False  # tiny setups: the generic kernel is already fast
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _load_or_build_fixedbase(setup, points, valid, c):
    """(table, table_valid) for the SRS, disk-cached by setup digest."""
    import os

    import jax

    from ..models.srs import _CACHE_DIR

    path = os.path.join(
        _CACHE_DIR, f"fixedbase_{setup.source_digest[:16]}_c{c}.npz"
    )
    if os.path.exists(path):
        data = np.load(path)
        return jnp.asarray(data["table"]), jnp.asarray(data["valid"])
    table, table_valid = msm.build_fixedbase_tables(points, valid, c)
    table = jax.block_until_ready(table)
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        np.savez(path, table=np.asarray(table), valid=np.asarray(table_valid))
    except OSError:
        pass
    return table, table_valid


class DeviceBackend:
    """JAX/TPU math backend bound to one trusted setup.

    mesh: optional (data, points) jax.sharding.Mesh — when given, every
    MSM runs sharded over the mesh and batched APIs shard the blob batch
    over the ``data`` axis. Results are bit-identical to mesh=None.
    """

    def __init__(self, setup, window_bits: int = None, mesh=None,
                 fixed_base: bool = None):
        self.setup = setup
        self.n = setup.n
        self.c = window_bits or _auto_window(self.n)
        self.mesh = mesh
        self.points, self.valid = g1_ops.make_points_host(
            setup.g1_lagrange_brp
        )
        self._fb = None
        self._fb_groups = 8
        if mesh is None and _fixed_base_enabled(fixed_base, self.n):
            self._fb = _load_or_build_fixedbase(
                setup, self.points, self.valid, self.c
            )
        if mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._points_axis = mesh.shape["points"]
            self._data_axis = mesh.shape["data"]
            if self.n % self._points_axis:
                raise ValueError(
                    f"setup size {self.n} not divisible by the points "
                    f"mesh axis ({self._points_axis})"
                )
            # Shard the SRS once at init; steps then consume it in place
            # (no per-call resharding).
            self.points = jax.device_put(
                self.points, NamedSharding(mesh, P(None, None, "points"))
            )
            self.valid = jax.device_put(
                self.valid, NamedSharding(mesh, P("points"))
            )
        self.domain = fr_poly.get_domain(self.n)

    # -- MSM routing (single-chip kernel vs sharded step) --------------------
    def _srs_msm_dispatch(self, scalars_plain: jnp.ndarray) -> jnp.ndarray:
        """SRS-basis MSM, async: fixed-base single point [3, L, 1] when
        tables are built, else generic window sums [3, L, W]."""
        from . import aot

        if self._fb is not None:
            return aot.call(
                "msm_fixedbase_device",
                msm.msm_fixedbase_device,
                (self._fb[0], self._fb[1], scalars_plain),
                static=(("c", self.c), ("groups", self._fb_groups)),
            )
        return self._msm_ws(scalars_plain)

    def _srs_msm_finalize(self, arr) -> object:
        """Device result of _srs_msm_dispatch -> host Jacobian point."""
        arr = np.asarray(arr)
        if self._fb is not None:
            return g1_ops.points_to_host(arr)[0]
        return msm.combine_windows_host(arr, self.c)

    def _msm_ws(self, scalars_plain: jnp.ndarray, points=None, valid=None,
                c=None, scalar_bits: int = 255):
        """[16, N] plain scalars -> [3, L, W] window sums (device)."""
        points = self.points if points is None else points
        valid = self.valid if valid is None else valid
        c = c or self.c
        if self.mesh is None:
            from . import aot

            return aot.call(
                "msm_device",
                msm.msm_device,
                (points, valid, scalars_plain),
                static=(("c", c), ("scalar_bits", scalar_bits)),
            )
        from ..parallel import msm as pmsm

        return pmsm.make_msm_step(self.mesh, c, scalar_bits=scalar_bits)(
            points, valid, scalars_plain
        )

    def _msm_ws_batch(self, scalars_batch: jnp.ndarray) -> List[np.ndarray]:
        """[B, 16, N] plain scalars -> list of [3, L, W] window sums (host).

        mesh=None: pipelined per-blob dispatch, ONE device sync.
        mesh: the batch shards over ``data``, points over ``points``
        (the multi-chip form of the reference's sequential batch loop).
        """
        import jax

        b = scalars_batch.shape[0]
        if self.mesh is None:
            results = [
                self._srs_msm_dispatch(scalars_batch[i]) for i in range(b)
            ]
            return list(np.asarray(jnp.stack(results)))
        from ..parallel import msm as pmsm

        d = self._data_axis
        pad = (-b) % d
        if pad:
            scalars_batch = jnp.concatenate(
                [scalars_batch, jnp.zeros_like(scalars_batch[:pad])], axis=0
            )
        step = pmsm.make_batch_msm_step(self.mesh, self.c)
        ws = step(self.points, self.valid, scalars_batch)
        return list(np.asarray(ws)[:b])

    # -- core ops ------------------------------------------------------------
    def commit(self, evals: Sequence[int]):
        """MSM over the brp-Lagrange basis -> host Jacobian G1 point."""
        scalars = msm.scalars_to_device(list(evals))
        return self._srs_msm_finalize(self._srs_msm_dispatch(scalars))

    def msm(self, scalars: Sequence[int], points_affine,
            scalar_bits: int = 255) -> object:
        """General MSM over arbitrary affine points (batch-verify lincombs,
        reference src/lib.rs:679-685) on the device kernels.

        scalar_bits: static promise that every scalar is < 2^scalar_bits
        (pass 248 for 31-byte-packed data; see ops/msm.prepare_digits).

        On a mesh the point list is padded (invalid lanes) to a
        power-of-two multiple of the points axis so shard shapes stay
        uniform and the jit cache stays small. Tiny MSMs (a handful of
        points, e.g. small-batch verify lincombs) stay on the host tier:
        dispatching a full sharded bucket pipeline for <= a few points
        per device costs more in collective latency (and, on the CPU
        dryrun mesh, minutes of compile) than the host scalar muls."""
        points = list(points_affine)
        scalars = list(scalars)
        c = _auto_window(len(points))
        from .. import native

        if native.available() and len(points) <= 2048:
            # latency tier: ~6 ms at 17 points vs ~55 ms for a device
            # dispatch + host window combine of that shape (measured)
            aff = native.g1_msm_affine([s % R for s in scalars], points)
            return (
                HC.from_affine(HC.FP_OPS, aff) if aff else HC.infinity(HC.FP_OPS)
            )
        if self.mesh is not None and len(points) <= max(
            16, 2 * self._points_axis
        ):
            import logging

            logging.getLogger(__name__).debug(
                "msm: %d points below mesh threshold; host tier", len(points)
            )
            return HC.g1_msm([s % R for s in scalars], points)
        if self.mesh is not None:
            pa = self._points_axis
            target = pa * _ceil_pow2(-(-len(points) // pa))
            pad = target - len(points)
            points = points + [None] * pad
            scalars = scalars + [0] * pad
        pts, valid = g1_ops.make_points_host(points)
        ws = self._msm_ws(
            msm.scalars_to_device(scalars), pts, valid, c, scalar_bits
        )
        return msm.combine_windows_host(np.asarray(ws), c)

    def commit_blob(self, blob: bytes):
        """Fast path: raw blob bytes -> host Jacobian G1 point.

        Skips the per-element int conversion entirely — the blob's
        little-endian wire format is reinterpreted as the device limb
        layout in one numpy view (ops/codec.py). Raises ValueError on
        non-canonical elements.
        """
        from . import codec

        limbs = jnp.asarray(codec.blob_to_limbs(blob, self.n))
        return self._srs_msm_finalize(self._srs_msm_dispatch(limbs))

    def commit_blobs(self, blobs):
        """Batched commit: all MSMs dispatched async, one device sync
        (mesh=None), or sharded over the ``data`` axis (mesh).

        The serving-throughput path (the reference loops blobs
        sequentially, src/lib.rs:562-596); ~3x the sync-latency rate on
        a tunnel-attached chip.
        """
        from . import codec

        # ONE stacked transfer (each host->device put pays a full RTT on
        # a tunnel-attached chip), then every MSM dispatches async.
        stacked = jnp.asarray(
            np.stack([codec.blob_to_limbs(bytes(b), self.n) for b in blobs])
        )
        fetched = self._msm_ws_batch(stacked)
        return [self._srs_msm_finalize(w) for w in fetched]

    def commit_scalars_device(self, scalars_plain: jnp.ndarray):
        """Same, but from an already-device [16, n] plain limb array."""
        return self._srs_msm_finalize(self._srs_msm_dispatch(scalars_plain))

    def evaluate(self, evals: Sequence[int], z: int) -> int:
        return self.domain.evaluate(list(evals), z)

    def quotient(self, evals: Sequence[int], z: int, y: int) -> List[int]:
        q_plain = self.domain.quotient_plain_device(list(evals), z, y)
        return lb.limbs_to_ints(np.asarray(q_plain))

    def evaluate_blobs(self, blobs, zs) -> List[int]:
        """Batched barycentric evaluation straight from blob bytes.

        Serving batch sizes route to the native C++ barycentric
        (~2.6 ms/blob, measured) — the device batch kernel costs ~500 ms
        at batch 16 through the tunnel and recompiles per batch size; it
        remains the tier for large batches and the no-native fallback."""
        from .. import native

        if native.available() and len(blobs) <= 256:
            roots_le = self._roots_le_bytes()
            return [
                native.blob_eval(bytes(b), roots_le, self.n, z)
                for b, z in zip(blobs, zs)
            ]
        from . import codec

        plain = np.stack(
            [codec.blob_to_limbs(bytes(b), self.n) for b in blobs]
        )
        return self.domain.evaluate_blobs_plain(plain, list(zs))

    def _roots_le_bytes(self) -> bytes:
        """brp-ordered domain as n x 32-byte little-endian (cached)."""
        if not hasattr(self, "_roots_le_cache"):
            from ..host import fft as FFT

            roots = FFT.bit_reversal_permutation(
                FFT.fr_roots_of_unity(self.n)
            )
            self._roots_le_cache = b"".join(
                w.to_bytes(32, "little") for w in roots
            )
        return self._roots_le_cache

    def decompress_g1_batch(self, compressed) -> List[object]:
        """Batched decompression+subgroup check -> host Jacobians.

        Serving batch sizes are latency-bound (~0.3 ms/point on the
        native tier vs ~180 ms for a 32-point device dispatch measured
        through the tunnel) — the device kernel (ops/g1_batch) is kept
        for huge point sets and as the no-native fallback.
        Raises ValueError naming the first bad index."""
        from .. import native

        compressed = list(compressed)
        if native.available() and len(compressed) <= 4096:
            out = []
            for i, data in enumerate(compressed):
                try:
                    aff = native.g1_decompress(bytes(data))
                except ValueError as e:
                    raise ValueError(f"bad G1 point at index {i}: {e}") from e
                out.append(
                    HC.from_affine(HC.FP_OPS, aff)
                    if aff
                    else HC.infinity(HC.FP_OPS)
                )
            return out
        from . import g1_batch

        pts_aff, is_inf, err = g1_batch.decompress_batch(compressed)
        if err.any():
            raise ValueError(f"bad G1 point at index {int(np.argmax(err))}")
        valid = ~np.asarray(is_inf)
        jac = g1_batch.lift_affine(pts_aff, valid)
        return g1_ops.points_to_host(jac)

    def open(self, evals: Sequence[int], z: int):
        """(proof point, y) with the quotient staying on-device end-to-end."""
        y = self.evaluate(evals, z)
        q_plain = self.domain.quotient_plain_device(list(evals), z % R, y)
        proof = self._srs_msm_finalize(self._srs_msm_dispatch(q_plain))
        return proof, y

    # -- blob-native fast paths (no per-element Python conversions) ---------
    def evaluate_blob(self, blob: bytes, z: int) -> int:
        return self.evaluate_blobs([blob], [z])[0]

    def open_blobs(self, blobs, zs):
        """Batched (proof, y) for many blobs: one stacked transfer, ONE
        batched eval kernel, ONE batched quotient kernel, pipelined (or
        data-sharded) MSMs, one stacked fetch.

        Falls back to the per-blob path for z-in-domain lanes (rare)."""
        from ..constants import R as _R
        from . import codec

        zs = [z % _R for z in zs]
        if any(self.domain.root_index.get(z) is not None for z in zs):
            return [self.open_blob(b, z) for b, z in zip(blobs, zs)]

        plains = [codec.blob_to_limbs(bytes(b), self.n) for b in blobs]
        stacked = jnp.asarray(np.stack(plains))  # [B, 16, n] plain
        evals_m = FR.to_mont(stacked)
        z_m = jnp.asarray(np.stack([FR.to_mont_host([z]) for z in zs]))
        zn1 = jnp.asarray(
            np.stack(
                [FR.to_mont_host([(pow(z, self.n, _R) - 1) % _R]) for z in zs]
            )
        )
        y_m = self.domain._eval_kernel(evals_m, z_m, zn1)  # [B, 16, 1]
        q_plain = self.domain._quotient_kernel(evals_m, y_m, z_m)  # [B,16,n]
        fetched_ws = self._msm_ws_batch(q_plain)
        ys = FR.from_mont_host(
            np.asarray(y_m).transpose(1, 0, 2).reshape(16, len(blobs))
        )
        return [
            (self._srs_msm_finalize(fetched_ws[i]), ys[i])
            for i in range(len(blobs))
        ]

    def open_blob(self, blob: bytes, z: int):
        """(proof point, y) straight from blob bytes: codec limbs ->
        device Montgomery -> barycentric + quotient + MSM; the per-call
        Python int/limb loops of the generic path disappear."""
        from ..constants import R as _R
        from . import codec

        z %= _R
        plain = codec.blob_to_limbs(bytes(blob), self.n)
        evals_m = FR.to_mont(jnp.asarray(plain))
        idx = self.domain.root_index.get(z)
        if idx is not None:
            y_m = None
            y = lb.limbs_to_ints(plain[:, idx : idx + 1])[0]
        else:
            z_m = jnp.asarray(FR.to_mont_host([z]))
            zn1 = jnp.asarray(
                FR.to_mont_host([(pow(z, self.n, _R) - 1) % _R])
            )
            y_m = self.domain._eval_kernel(evals_m, z_m, zn1)
        # dispatch quotient + MSM BEFORE fetching y: one device sync total
        q_plain = self.domain.quotient_plain_from_mont(
            evals_m, z, y_m if y_m is not None else 0
        )
        result = self._srs_msm_dispatch(q_plain)
        if y_m is not None:
            y = FR.from_mont_host(np.asarray(y_m))[0]
        proof = self._srs_msm_finalize(result)
        return proof, y
