"""Batched Fp2 = Fp[u]/(u^2 + 1) arithmetic on device (JAX/XLA).

The device tier of the extension-tower groundwork (SURVEY.md §2b rows
3/5: lambdaworks `Degree2ExtensionField`, used by the reference at
src/compression.rs:10, src/utils.rs:10): elements are uint32[2, L, B]
arrays (component axis, Montgomery limb axis, batch lanes), built on the
same radix-2^16 Montgomery Fp kernels as G1 (ops/field_ops.FP).

Together with ops/g2_ops.py this puts the G2/twist group law on device
(batched subgroup checks for setup loading, and the operand prep for a
future vmapped Miller loop). Differential-tested limb-exact against the
host oracle (lambdaworks_kzg_tpu/host/field.py) in tests/test_fp2_ops.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .field_ops import FP

L = FP.L


def from_host(values) -> np.ndarray:
    """[(c0, c1), ...] ints -> uint32[2, L, B] Montgomery limbs."""
    c0 = FP.to_mont_host([v[0] for v in values])
    c1 = FP.to_mont_host([v[1] for v in values])
    return np.stack([c0, c1])


def to_host(arr) -> list:
    """uint32[2, L, B] -> [(c0, c1), ...] ints."""
    arr = np.asarray(arr)
    c0 = FP.from_mont_host(arr[0])
    c1 = FP.from_mont_host(arr[1])
    return list(zip(c0, c1))


def add(a, b):
    return jnp.stack([FP.add(a[0], b[0]), FP.add(a[1], b[1])])


def sub(a, b):
    return jnp.stack([FP.sub(a[0], b[0]), FP.sub(a[1], b[1])])


def neg(a):
    return jnp.stack([FP.neg(a[0]), FP.neg(a[1])])


def conj(a):
    """Frobenius x -> x^p: (c0, -c1)."""
    return jnp.stack([a[0], FP.neg(a[1])])


def double(a):
    return add(a, a)


def mul(a, b):
    """Karatsuba over the u^2 = -1 residue: 3 Fp muls.

    c0 = a0 b0 - a1 b1
    c1 = (a0 + a1)(b0 + b1) - a0 b0 - a1 b1
    """
    t0 = FP.mul(a[0], b[0])
    t1 = FP.mul(a[1], b[1])
    s = FP.mul(FP.add(a[0], a[1]), FP.add(b[0], b[1]))
    return jnp.stack([FP.sub(t0, t1), FP.sub(FP.sub(s, t0), t1)])


def sqr(a):
    """Complex squaring: 2 Fp muls.

    c0 = (a0 + a1)(a0 - a1);  c1 = 2 a0 a1
    """
    t = FP.mul(FP.add(a[0], a[1]), FP.sub(a[0], a[1]))
    m = FP.mul(a[0], a[1])
    return jnp.stack([t, FP.add(m, m)])


def mul_by_nonresidue(a):
    """x * (1 + u), the Fp6/Fp12 tower constant (and the twist b)."""
    return jnp.stack([FP.sub(a[0], a[1]), FP.add(a[0], a[1])])


def inv(a):
    """conj(a) / norm(a); norm = a0^2 + a1^2 (Fermat Fp inversion,
    batch-parallel). Maps 0 -> 0."""
    norm = FP.add(FP.sqr(a[0]), FP.sqr(a[1]))
    t = FP.inv(norm)
    return jnp.stack([FP.mul(a[0], t), FP.neg(FP.mul(a[1], t))])


def is_zero(a):
    """bool[..., B]."""
    return FP.is_zero(a[0]) & FP.is_zero(a[1])


def eq(a, b):
    return FP.eq(a[0], b[0]) & FP.eq(a[1], b[1])


class Fp2Field:
    """Field-ops adapter with the duck-typed surface ops/formulas.py
    expects (same shape contract as field_ops.FP but elements carry a
    leading component axis [2, L, B])."""

    L = L

    add = staticmethod(add)
    sub = staticmethod(sub)
    mul = staticmethod(mul)
    sqr = staticmethod(sqr)
    neg = staticmethod(neg)
    double = staticmethod(double)
    is_zero = staticmethod(is_zero)
    eq = staticmethod(eq)


FP2 = Fp2Field()
