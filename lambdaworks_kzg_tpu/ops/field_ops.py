"""Vectorized Montgomery prime-field arithmetic (JAX/XLA, TPU-first).

TPU-native replacement for lambdaworks-math's Montgomery backend
(SURVEY.md §2b: Fp 381-bit and Fr 255-bit fields). All ops are
batch-parallel over the TRAILING batch axis of uint32[..., L, B] limb
arrays (see ops/limbs.py for the layout rationale) and stay inside
jit/vmap/shard_map.

Montgomery representation: x_mont = x * R mod N with R = 2^(16 L).
REDC uses full-width column products (better XLA parallelism than a
sequential CIOS recurrence; carry scans are the only sequential part).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import P, R as FR_MODULUS
from . import limbs as lb


class MontgomeryField:
    """A prime field N with L 16-bit limbs, Montgomery arithmetic."""

    def __init__(self, modulus: int, num_limbs: int, name: str):
        assert modulus < (1 << (16 * num_limbs))
        self.modulus = modulus
        self.L = num_limbs
        self.name = name
        self.R = 1 << (16 * num_limbs)
        self.R2 = self.R * self.R % modulus
        # N' = -N^{-1} mod R  (full width, for m = T_lo * N' mod R)
        self.n_prime = (-pow(modulus, -1, self.R)) % self.R

        self.N_limbs = jnp.asarray(lb.int_to_limbs(modulus, num_limbs))
        self.NPRIME_limbs = jnp.asarray(lb.int_to_limbs(self.n_prime, num_limbs))
        self.R2_limbs = jnp.asarray(lb.int_to_limbs(self.R2, num_limbs))
        self.one_mont_int = self.R % modulus
        self.ONE_limbs = jnp.asarray(lb.int_to_limbs(self.one_mont_int, num_limbs))
        # exponent bits for Fermat inversion, LSB first
        self._inv_exp_bits = jnp.asarray(
            [(modulus - 2) >> i & 1 for i in range(16 * num_limbs)],
            dtype=jnp.uint32,
        )

    # -- host conversions (produce limbs-first [L, N] arrays) ---------------
    def to_mont_host(self, values) -> np.ndarray:
        return lb.ints_to_limbs(
            [v * self.R % self.modulus for v in values], self.L
        )

    def from_mont_host(self, limbs) -> list:
        r_inv = pow(self.R, -1, self.modulus)
        return [
            v * r_inv % self.modulus for v in lb.limbs_to_ints(np.asarray(limbs))
        ]

    def from_int_host(self, values) -> np.ndarray:
        """Plain (non-Montgomery) residues -> limb array [L, N]."""
        return lb.ints_to_limbs([v % self.modulus for v in values], self.L)

    # -- core ops (all jit-friendly) ------------------------------------------
    def redc(self, t: jnp.ndarray) -> jnp.ndarray:
        """Montgomery reduction: t[..., 2L, B] -> t * R^-1 mod N, in [0, N)."""
        L = self.L
        m = lb.mul_low(t[..., :L, :], self.NPRIME_limbs, L)
        mn = lb.mul_wide(m, self.N_limbs)
        u = lb.normalize(t + mn)  # low L limbs become zero; no carry lost
        u_hi = u[..., L:, :]
        ge = lb.compare_ge(u_hi, self.N_limbs)
        return lb.select(ge, lb.sub_mod_pow2(u_hi, self.N_limbs), u_hi)

    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return self.redc(lb.mul_wide(a, b))

    def sqr(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.redc(lb.mul_wide(a, a))

    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        t = lb.add(a, b)  # < 2N < R, no dropped carry
        ge = lb.compare_ge(t, self.N_limbs)
        return lb.select(ge, lb.sub_mod_pow2(t, self.N_limbs), t)

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        d = lb.sub_mod_pow2(a, b)
        ge = lb.compare_ge(a, b)
        return lb.select(ge, d, lb.add(d, self.N_limbs))

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        nz = jnp.any(a != 0, axis=-2)
        d = lb.sub_mod_pow2(jnp.broadcast_to(self.N_limbs, a.shape), a)
        return lb.select(nz, d, a)

    def double(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.add(a, a)

    def to_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, jnp.broadcast_to(self.R2_limbs, a.shape))

    def from_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        L = self.L
        t = jnp.concatenate(
            [a, jnp.zeros(a.shape[:-2] + (L,) + a.shape[-1:], dtype=jnp.uint32)],
            axis=-2,
        )
        return self.redc(t)

    def inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Fermat inversion a^(N-2), batch-parallel square-and-multiply.

        (Chosen over the Montgomery batch-inverse trick, whose prefix
        products are sequential over the batch — the wrong axis on TPU.)
        Maps 0 -> 0.
        """
        nbits = 16 * self.L

        def body(i, carry):
            res, base = carry
            bit = self._inv_exp_bits[i]
            res = lb.select(
                jnp.broadcast_to(bit.astype(bool), res.shape[:-2] + res.shape[-1:]),
                self.mul(res, base),
                res,
            )
            base = self.sqr(base)
            return (res, base)

        one = jnp.broadcast_to(self.ONE_limbs, a.shape).astype(jnp.uint32)
        res, _ = jax.lax.fori_loop(0, nbits, body, (one, a))
        return res

    def pow_fixed(self, a: jnp.ndarray, exponent: int) -> jnp.ndarray:
        """a^exponent for a host-known exponent (fori_loop over its bits)."""
        nbits = max(exponent.bit_length(), 1)
        bits = jnp.asarray(
            [(exponent >> i) & 1 for i in range(nbits)], dtype=jnp.uint32
        )

        def body(i, carry):
            res, base = carry
            take = jnp.broadcast_to(
                bits[i].astype(bool), res.shape[:-2] + res.shape[-1:]
            )
            res = lb.select(take, self.mul(res, base), res)
            base = self.sqr(base)
            return (res, base)

        one = jnp.broadcast_to(self.ONE_limbs, a.shape).astype(jnp.uint32)
        res, _ = jax.lax.fori_loop(0, nbits, body, (one, a))
        return res

    def is_zero(self, a: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == 0, axis=-2)

    def eq(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == b, axis=-2)

    def select(self, mask, a, b):
        return lb.select(mask, a, b)


# Module-level field instances (shared compiled kernels via identical shapes)
FP = MontgomeryField(P, 24, "fp")
FR = MontgomeryField(FR_MODULUS, 16, "fr")
