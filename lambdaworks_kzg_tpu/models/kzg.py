"""KZG commitment scheme over the evaluation-form domain.

Replaces the reference's external `lambdaworks-crypto`
`KateZaveruchaGoldberg` scheme (used at reference src/lib.rs:269-270,
328-329, 393-394, 443-444, 495-496, 690-691), re-based on evaluation-form
polynomials (the consensus-spec semantics) instead of monomial form.

The math backend is pluggable:
  * HostBackend  — exact Python-int oracle (this module)
  * DeviceBackend — JAX/TPU kernels (ops/), selected automatically when
    available; bit-identical results, orders of magnitude faster.
"""

from typing import List, Optional, Sequence, Tuple

from ..constants import R
from ..host import curve as C
from ..host import fft as FFT
from ..host.field import batch_fr_inv
from ..host.pairing import pairings_verify
from .srs import TrustedSetup


class HostBackend:
    """Python-int math backend (oracle tier)."""

    def __init__(self, setup: TrustedSetup):
        self.setup = setup
        self.n = setup.n
        self.roots_brp = FFT.bit_reversal_permutation(
            FFT.fr_roots_of_unity(self.n)
        )
        self._root_index = {w: i for i, w in enumerate(self.roots_brp)}

    # -- core ops ----------------------------------------------------------
    def commit(self, evals: Sequence[int]):
        """MSM over the bit-reversed Lagrange basis -> Jacobian G1 point."""
        return C.g1_msm(list(evals), self.setup.g1_lagrange_brp)

    def evaluate(self, evals: Sequence[int], z: int) -> int:
        """p(z) by barycentric formula (or direct lookup if z in domain)."""
        z %= R
        idx = self._root_index.get(z)
        if idx is not None:
            return evals[idx] % R
        return FFT.barycentric_evaluate(list(evals), z, self.n)

    def msm(self, scalars: Sequence[int], points_affine) -> object:
        """General MSM over arbitrary affine points (batch-verify lincombs)."""
        return C.g1_msm(list(scalars), list(points_affine))

    def quotient(self, evals: Sequence[int], z: int, y: int) -> List[int]:
        """Evaluations of q(x) = (p(x) - y)/(x - z) on the brp domain."""
        z %= R
        n = self.n
        roots = self.roots_brp
        shifted = [(e - y) % R for e in evals]
        m = self._root_index.get(z)
        denoms = [(w - z) % R for w in roots]
        inv_denoms = batch_fr_inv(denoms)  # zero denominator -> 0
        q = [shifted[i] * inv_denoms[i] % R for i in range(n)]
        if m is not None:
            # q(w_m) = sum_{i != m} (p_i - y) * w_i / (z * (z - w_i))
            zinv = pow(z, R - 2, R)
            acc = 0
            for i in range(n):
                if i == m:
                    continue
                # 1/(z - w_i) = -1/(w_i - z) = -inv_denoms[i]
                acc += shifted[i] * roots[i] % R * (R - inv_denoms[i]) % R
            q[m] = acc % R * zinv % R
        return q


class KZG:
    """Evaluation-form KZG commit / open / verify bound to one SRS."""

    def __init__(
        self,
        setup: TrustedSetup,
        backend: Optional[object] = None,
        config: Optional[object] = None,
        mesh=None,
    ):
        from ..utils.config import KZGConfig

        self.setup = setup
        self.config = config if config is not None else KZGConfig.from_env()
        self.backend = backend or self.config.make_backend(setup, mesh=mesh)
        # protocol G2 constants: [1]_2 and [s]_2 (reference srs.rs:254,274)
        self.g2_one = C.from_affine(C.FP2_OPS, setup.g2_monomial[0])
        self.g2_s = C.from_affine(C.FP2_OPS, setup.g2_monomial[1])

    # -- commitments --------------------------------------------------------
    def commit(self, evals: Sequence[int]):
        return self.backend.commit(evals)

    def evaluate(self, evals: Sequence[int], z: int) -> int:
        return self.backend.evaluate(evals, z)

    def open(self, evals: Sequence[int], z: int) -> Tuple[object, int]:
        """Returns (proof point, y = p(z))."""
        if hasattr(self.backend, "open"):
            return self.backend.open(evals, z)
        y = self.backend.evaluate(evals, z)
        q = self.backend.quotient(evals, z, y)
        return self.backend.commit(q), y

    # -- verification -------------------------------------------------------
    def verify(self, commitment, z: int, y: int, proof) -> bool:
        """e(C - [y]G1, [1]_2) == e(proof, [s - z]_2).

        Routed through the native C++ tier when built (pairing + the two
        fixed-base scalar muls are latency-bound single-point ops, ~100x
        slower in Python ints); LWKZG_NATIVE=0 forces the Python oracle,
        LWKZG_DEVICE_PAIRING=1 runs the pairing on the device tier.
        """
        ops, ops2 = C.FP_OPS, C.FP2_OPS
        from .. import native

        if getattr(self.config, "device_pairing", False):
            from ..ops import pairing_ops as PO

            p_minus_y = C.point_add(
                ops,
                commitment,
                C.point_neg(ops, C.point_scalar_mul(ops, C.G1_GENERATOR, y)),
            )
            x_minus_z = C.point_add(
                ops2,
                self.g2_s,
                C.point_neg(ops2, C.point_scalar_mul(ops2, C.G2_GENERATOR, z)),
            )
            return PO.pairings_verify_host_points(
                p_minus_y, self.g2_one, proof, x_minus_z
            )
        if native.available():
            yg = native.g1_scalar_mul_affine(
                C.to_affine(ops, C.G1_GENERATOR), y % R
            )
            zg2 = native.g2_scalar_mul_affine(
                C.to_affine(ops2, C.G2_GENERATOR), z % R
            )
            p_minus_y = C.point_add(
                ops, commitment, C.point_neg(ops, C.from_affine(ops, yg))
            ) if yg else commitment
            x_minus_z = C.point_add(
                ops2, self.g2_s, C.point_neg(ops2, C.from_affine(ops2, zg2))
            ) if zg2 else self.g2_s
            return native.pairings_verify_affine(
                C.to_affine(ops, p_minus_y),
                C.to_affine(ops2, self.g2_one),
                C.to_affine(ops, proof),
                C.to_affine(ops2, x_minus_z),
            )
        p_minus_y = C.point_add(
            ops,
            commitment,
            C.point_neg(ops, C.point_scalar_mul(ops, C.G1_GENERATOR, y)),
        )
        x_minus_z = C.point_add(
            ops2,
            self.g2_s,
            C.point_neg(ops2, C.point_scalar_mul(ops2, C.G2_GENERATOR, z)),
        )
        return pairings_verify(p_minus_y, self.g2_one, proof, x_minus_z)

    def verify_batch(
        self,
        commitments: Sequence[object],
        zs: Sequence[int],
        ys: Sequence[int],
        proofs: Sequence[object],
        r_powers: Sequence[int],
    ) -> bool:
        """Random-linear-combination batch check (one pairing).

        Parity: reference verify_kzg_proof_batch (src/lib.rs:639-692):
          proof_lincomb   = sum r^i proof_i
          proof_z_lincomb = sum r^i z_i proof_i
          C_minus_y       = C_i - [y_i]G1
          rhs             = sum r^i C_minus_y_i + proof_z_lincomb
          check e(proof_lincomb, [s]_2) == e(rhs, [1]_2)

        Unlike the reference's per-item [y_i]G scalar muls (src/lib.rs:664),
        the -sum(r^i y_i) G term folds into the commitment MSM as one extra
        point: sum r^i (C_i - [y_i]G) = MSM({C_i} + {G}, {r^i} + {-sum}).
        The three MSMs route through the math backend (device kernels when
        available).
        """
        ops = C.FP_OPS
        msm = self.backend.msm
        proof_aff = [C.to_affine(ops, p) for p in proofs]
        commitment_aff = [C.to_affine(ops, pt) for pt in commitments]
        g1_aff = C.to_affine(ops, C.G1_GENERATOR)
        neg_y_sum = (-sum(r * y for r, y in zip(r_powers, ys))) % R
        proof_lincomb = msm(list(r_powers), proof_aff)
        proof_z_lincomb = msm(
            [r * z % R for r, z in zip(r_powers, zs)], proof_aff
        )
        c_minus_y_lincomb = msm(
            list(r_powers) + [neg_y_sum], commitment_aff + [g1_aff]
        )
        rhs = C.point_add(ops, c_minus_y_lincomb, proof_z_lincomb)
        from .. import native

        if getattr(self.config, "device_pairing", False):
            from ..ops import pairing_ops as PO

            return PO.pairings_verify_host_points(
                rhs, self.g2_one, proof_lincomb, self.g2_s
            )
        if native.available():
            return native.pairings_verify_affine(
                C.to_affine(ops, rhs),
                C.to_affine(C.FP2_OPS, self.g2_one),
                C.to_affine(ops, proof_lincomb),
                C.to_affine(C.FP2_OPS, self.g2_s),
            )
        return pairings_verify(rhs, self.g2_one, proof_lincomb, self.g2_s)


