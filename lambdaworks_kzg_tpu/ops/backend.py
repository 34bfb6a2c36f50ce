"""DeviceBackend: the TPU execution tier behind models/kzg.KZG.

Holds the SRS as device-resident Montgomery limb arrays (created once —
fixing the reference's per-call SRS reconversion, src/srs.rs:258-280) and
routes commit / evaluate / quotient through the JAX kernels in ops/.
Bit-identical to models/kzg.HostBackend (the Python-int oracle); the
consensus vectors pass through either backend.
"""

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from ..constants import R
from ..host import curve as HC
from . import fr_poly, g1_ops, limbs as lb, msm
from .field_ops import FR


def _auto_window(n: int) -> int:
    """Pippenger window size tuned for lane occupancy vs. bucket load.

    c must divide 256 evenly: otherwise the top window spans past bit
    255 and its few occupied buckets concentrate the load — the lockstep
    accumulation loop runs max-bucket-load iterations, so a skewed top
    window dominates (measured 10x regression at c=10 on 2^16 points).
    """
    if n <= 256:
        return 4
    return 8


class DeviceBackend:
    """JAX/TPU math backend bound to one trusted setup."""

    def __init__(self, setup, window_bits: int = None):
        self.setup = setup
        self.n = setup.n
        self.c = window_bits or _auto_window(self.n)
        self.points, self.valid = g1_ops.make_points_host(
            setup.g1_lagrange_brp
        )
        self.domain = fr_poly.get_domain(self.n)

    # -- core ops ------------------------------------------------------------
    def commit(self, evals: Sequence[int]):
        """MSM over the brp-Lagrange basis -> host Jacobian G1 point."""
        scalars = msm.scalars_to_device(list(evals))
        return msm.msm(self.points, self.valid, scalars, c=self.c)

    def msm(self, scalars: Sequence[int], points_affine) -> object:
        """General MSM over arbitrary affine points (batch-verify lincombs,
        reference src/lib.rs:679-685) on the device kernels."""
        points = list(points_affine)
        pts, valid = g1_ops.make_points_host(points)
        return msm.msm(
            pts,
            valid,
            msm.scalars_to_device(list(scalars)),
            c=_auto_window(len(points)),
        )

    def commit_blob(self, blob: bytes):
        """Fast path: raw blob bytes -> host Jacobian G1 point.

        Skips the per-element int conversion entirely — the blob's
        little-endian wire format is reinterpreted as the device limb
        layout in one numpy view (ops/codec.py). Raises ValueError on
        non-canonical elements.
        """
        from . import codec

        limbs = jnp.asarray(codec.blob_to_limbs(blob, self.n))
        return msm.msm(self.points, self.valid, limbs, c=self.c)

    def commit_blobs(self, blobs):
        """Batched commit: all MSMs dispatched async, one device sync.

        The serving-throughput path (the reference loops blobs
        sequentially, src/lib.rs:562-596); ~3x the sync-latency rate on
        a tunnel-attached chip.
        """
        import jax

        from . import codec

        # ONE stacked transfer (each host->device put pays a full RTT on
        # a tunnel-attached chip), then every MSM dispatches async.
        stacked = jnp.asarray(
            np.stack([codec.blob_to_limbs(bytes(b), self.n) for b in blobs])
        )
        window_sums = [
            msm.msm_device(self.points, self.valid, stacked[i], self.c)
            for i in range(len(blobs))
        ]
        # ONE device->host fetch (per-array np.asarray pays an RTT each)
        fetched = np.asarray(jnp.stack(window_sums))
        return [msm.combine_windows_host(w, self.c) for w in fetched]

    def commit_scalars_device(self, scalars_plain: jnp.ndarray):
        """Same, but from an already-device [16, n] plain limb array."""
        return msm.msm(self.points, self.valid, scalars_plain, c=self.c)

    def evaluate(self, evals: Sequence[int], z: int) -> int:
        return self.domain.evaluate(list(evals), z)

    def quotient(self, evals: Sequence[int], z: int, y: int) -> List[int]:
        q_plain = self.domain.quotient_plain_device(list(evals), z, y)
        from . import limbs as lb

        return lb.limbs_to_ints(np.asarray(q_plain))

    def evaluate_blobs(self, blobs, zs) -> List[int]:
        """Batched barycentric evaluation straight from blob bytes."""
        import numpy as np

        from . import codec

        plain = np.stack(
            [codec.blob_to_limbs(bytes(b), self.n) for b in blobs]
        )
        return self.domain.evaluate_blobs_plain(plain, list(zs))

    def decompress_g1_batch(self, compressed) -> List[object]:
        """Batched device decompression+subgroup check -> host Jacobians.

        Raises ValueError naming the first bad index."""
        import numpy as np

        from . import g1_batch

        pts_aff, is_inf, err = g1_batch.decompress_batch(list(compressed))
        if err.any():
            raise ValueError(f"bad G1 point at index {int(np.argmax(err))}")
        valid = ~np.asarray(is_inf)
        jac = g1_batch.lift_affine(pts_aff, valid)
        return g1_ops.points_to_host(jac)

    def open(self, evals: Sequence[int], z: int):
        """(proof point, y) with the quotient staying on-device end-to-end."""
        y = self.evaluate(evals, z)
        q_plain = self.domain.quotient_plain_device(list(evals), z % R, y)
        proof = msm.msm(self.points, self.valid, q_plain, c=self.c)
        return proof, y

    # -- blob-native fast paths (no per-element Python conversions) ---------
    def evaluate_blob(self, blob: bytes, z: int) -> int:
        return self.evaluate_blobs([blob], [z])[0]

    def open_blobs(self, blobs, zs):
        """Batched (proof, y) for many blobs: one stacked transfer, ONE
        batched eval kernel, ONE batched quotient kernel, pipelined MSMs,
        one stacked fetch. (Per-blob kernels ran ~50 ms of XLA-tier Fr
        work each; batching them amortizes it across the batch.)

        Falls back to the per-blob path for z-in-domain lanes (rare)."""
        import jax

        from ..constants import R as _R
        from . import codec

        zs = [z % _R for z in zs]
        if any(self.domain.root_index.get(z) is not None for z in zs):
            plains = [codec.blob_to_limbs(bytes(b), self.n) for b in blobs]
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
        window_sums = [
            msm.msm_device(self.points, self.valid, q_plain[i], self.c)
            for i in range(len(blobs))
        ]
        fetched_ws = np.asarray(jnp.stack(window_sums))
        ys = FR.from_mont_host(
            np.asarray(y_m).transpose(1, 0, 2).reshape(16, len(blobs))
        )
        return [
            (msm.combine_windows_host(fetched_ws[i], self.c), ys[i])
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
        window_sums = msm.msm_device(self.points, self.valid, q_plain, self.c)
        if y_m is not None:
            y = FR.from_mont_host(np.asarray(y_m))[0]
        proof = msm.combine_windows_host(np.asarray(window_sums), self.c)
        return proof, y
