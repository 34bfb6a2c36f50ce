"""Batched Fp6 / Fp12 extension-tower arithmetic on device (JAX/XLA).

Completes the device tier of SURVEY.md §2b row 3 (lambdaworks
`Degree6ExtensionField` / `Degree12ExtensionField`, the GT-side types the
reference's pairing uses through `BLS12381AtePairing`, src/utils.rs:224):

    Fp2  = Fp[u]  / (u^2 + 1)          (ops/fp2_ops.py)
    Fp6  = Fp2[v] / (v^3 - xi),  xi = 1 + u
    Fp12 = Fp6[w] / (w^2 - v)

Elements are PYTREES of Fp2 limb arrays (uint32[2, L, B]): an Fp6 value
is a 3-tuple of Fp2 values, an Fp12 value a 2-tuple of Fp6 values —
exactly the host oracle's representation (host/field.py:149-322), so the
port is mechanical and differential tests compare structures 1:1. Tuples
(not stacked arrays) keep every op a pure function over leaf arrays that
XLA fuses freely, and make scan carries (Miller loop, final exp) natural.

Differential-tested limb-exact against host/field.py in
tests/test_tower_ops.py.
"""

import numpy as np

from .fp2_ops import FP2, add as fp2_add, conj as fp2_conj
from .fp2_ops import from_host as fp2_from_host
from .fp2_ops import inv as fp2_inv
from .fp2_ops import is_zero as fp2_is_zero
from .fp2_ops import mul as fp2_mul
from .fp2_ops import mul_by_nonresidue as fp2_mul_by_xi
from .fp2_ops import neg as fp2_neg
from .fp2_ops import sqr as fp2_sqr
from .fp2_ops import sub as fp2_sub
from .field_ops import FP

L = FP.L


# ---------------------------------------------------------------------------
# constructors / host bridges
# ---------------------------------------------------------------------------


def fp2_zero(b: int) -> np.ndarray:
    return np.zeros((2, L, b), dtype=np.uint32)


def fp2_one(b: int) -> np.ndarray:
    one = np.broadcast_to(
        np.asarray(FP.ONE_limbs, dtype=np.uint32).reshape(L, 1), (L, b)
    )
    return np.stack([one, np.zeros((L, b), dtype=np.uint32)])


def fp6_from_host(values):
    """[( (c00,c01), (c10,c11), (c20,c21) ), ...] -> 3-tuple of [2, L, B]."""
    return tuple(fp2_from_host([v[i] for v in values]) for i in range(3))


def fp6_to_host(a):
    from .fp2_ops import to_host

    comps = [to_host(c) for c in a]
    return list(zip(*comps))


def fp12_from_host(values):
    """Host fp12 tuples ((fp6), (fp6)) -> 2-tuple of device fp6."""
    return tuple(fp6_from_host([v[i] for v in values]) for i in range(2))


def fp12_to_host(a):
    c0 = fp6_to_host(a[0])
    c1 = fp6_to_host(a[1])
    return list(zip(c0, c1))


def fp12_one(b: int):
    zero = fp2_zero(b)
    return ((fp2_one(b), zero, zero), (zero, zero, zero))


# ---------------------------------------------------------------------------
# Fp6 = Fp2[v] / (v^3 - xi)
# ---------------------------------------------------------------------------


def fp6_add(a, b):
    return tuple(fp2_add(x, y) for x, y in zip(a, b))


def fp6_sub(a, b):
    return tuple(fp2_sub(x, y) for x, y in zip(a, b))


def fp6_neg(a):
    return tuple(fp2_neg(x) for x in a)


def fp6_mul(a, b):
    """Toom/Karatsuba interpolation: 6 Fp2 muls (host/field.py:169-188)."""
    a0, a1, a2 = a
    b0, b1, b2 = b
    t0 = fp2_mul(a0, b0)
    t1 = fp2_mul(a1, b1)
    t2 = fp2_mul(a2, b2)
    c0 = fp2_add(
        t0,
        fp2_mul_by_xi(
            fp2_sub(
                fp2_sub(fp2_mul(fp2_add(a1, a2), fp2_add(b1, b2)), t1), t2
            )
        ),
    )
    c1 = fp2_add(
        fp2_sub(fp2_sub(fp2_mul(fp2_add(a0, a1), fp2_add(b0, b1)), t0), t1),
        fp2_mul_by_xi(t2),
    )
    c2 = fp2_add(
        fp2_sub(fp2_sub(fp2_mul(fp2_add(a0, a2), fp2_add(b0, b2)), t0), t2),
        t1,
    )
    return (c0, c1, c2)


def fp6_sqr(a):
    return fp6_mul(a, a)


def fp6_mul_by_v(a):
    """(a0 + a1 v + a2 v^2) * v = xi a2 + a0 v + a1 v^2."""
    return (fp2_mul_by_xi(a[2]), a[0], a[1])


def fp6_inv(a):
    """Cramer form over the cubic tower (host/field.py:200-210); one
    batch-parallel Fp2 inversion. Maps 0 -> 0."""
    a0, a1, a2 = a
    c0 = fp2_sub(fp2_sqr(a0), fp2_mul_by_xi(fp2_mul(a1, a2)))
    c1 = fp2_sub(fp2_mul_by_xi(fp2_sqr(a2)), fp2_mul(a0, a1))
    c2 = fp2_sub(fp2_sqr(a1), fp2_mul(a0, a2))
    t = fp2_add(
        fp2_mul(a0, c0),
        fp2_mul_by_xi(fp2_add(fp2_mul(a2, c1), fp2_mul(a1, c2))),
    )
    t_inv = fp2_inv(t)
    return (fp2_mul(c0, t_inv), fp2_mul(c1, t_inv), fp2_mul(c2, t_inv))


def fp6_is_zero(a):
    return fp2_is_zero(a[0]) & fp2_is_zero(a[1]) & fp2_is_zero(a[2])


# ---------------------------------------------------------------------------
# Fp12 = Fp6[w] / (w^2 - v)
# ---------------------------------------------------------------------------


def fp12_mul(a, b):
    """Karatsuba over the quadratic step: 2 Fp6 muls + 1 for the cross
    term (host/field.py:233-240)."""
    a0, a1 = a
    b0, b1 = b
    t0 = fp6_mul(a0, b0)
    t1 = fp6_mul(a1, b1)
    c0 = fp6_add(t0, fp6_mul_by_v(t1))
    c1 = fp6_sub(fp6_sub(fp6_mul(fp6_add(a0, a1), fp6_add(b0, b1)), t0), t1)
    return (c0, c1)


def fp12_sqr(a):
    a0, a1 = a
    t = fp6_mul(a0, a1)
    c0 = fp6_sub(
        fp6_sub(fp6_mul(fp6_add(a0, a1), fp6_add(a0, fp6_mul_by_v(a1))), t),
        fp6_mul_by_v(t),
    )
    return (c0, fp6_add(t, t))


def fp12_inv(a):
    a0, a1 = a
    t = fp6_inv(fp6_sub(fp6_sqr(a0), fp6_mul_by_v(fp6_sqr(a1))))
    return (fp6_mul(a0, t), fp6_neg(fp6_mul(a1, t)))


def fp12_conj(a):
    """Frobenius^6: inversion on the cyclotomic subgroup (GT)."""
    return (a[0], fp6_neg(a[1]))


def _fp4_sq(a, b):
    """(a + b s)^2 in Fp4 = Fp2[s]/(s^2 - xi)."""
    t0 = fp2_sqr(a)
    t1 = fp2_sqr(b)
    o0 = fp2_add(t0, fp2_mul_by_xi(t1))
    s = fp2_sqr(fp2_add(a, b))
    return o0, fp2_sub(fp2_sub(s, t0), t1)


def _tri_m(t, z):  # 3t - 2z
    r = fp2_sub(t, z)
    return fp2_add(fp2_add(r, r), t)


def _tri_p(t, z):  # 3t + 2z
    r = fp2_add(t, z)
    return fp2_add(fp2_add(r, r), t)


def fp12_cyc_sqr(g):
    """Granger-Scott squaring — valid ONLY in the cyclotomic subgroup
    (post-easy-part, where the final-exp hard part lives): 3 Fp4
    squarings (9 Fp2 squarings) vs fp12_sqr's ~18 Fp2 muls.
    Differential-tested against fp12_sqr on cyclotomic elements."""
    (z0, z4, z3), (z2, z1, z5) = g
    t0, t1 = _fp4_sq(z0, z1)
    z0 = _tri_m(t0, z0)
    z1 = _tri_p(t1, z1)
    t0, t1 = _fp4_sq(z2, z3)
    t2, t3 = _fp4_sq(z4, z5)
    z4 = _tri_m(t0, z4)
    z5 = _tri_p(t1, z5)
    z2 = _tri_p(fp2_mul_by_xi(t3), z2)
    z3 = _tri_m(t2, z3)
    return ((z0, z4, z3), (z2, z1, z5))


def fp12_eq_one(a):
    """bool[B]: a == 1 in Fp12 (Montgomery one in slot c0)."""
    one = np.asarray(fp2_one(1))
    diff = fp2_sub(a[0][0], one)
    rest_zero = fp2_is_zero(diff)
    for c in (a[0][1], a[0][2], *a[1]):
        rest_zero = rest_zero & fp2_is_zero(c)
    return rest_zero


# ---------------------------------------------------------------------------
# Frobenius
# ---------------------------------------------------------------------------

_GAMMA = None  # NUMPY [2, L, 1] constants (jnp constants cached across
# traces leak tracers — see g1_batch._beta_mont)


def _gamma():
    global _GAMMA
    if _GAMMA is None:
        from ..host import field as HF

        _GAMMA = [fp2_from_host([g]) for g in HF._FROB_GAMMA]
    return _GAMMA


def fp12_frobenius(a):
    """a^p: conjugate each w-slot coefficient, multiply slot i by
    gamma^i = xi^(i(p-1)/6) (host/field.py:306-316)."""
    (c0, c2, c4), (c1, c3, c5) = a
    g = _gamma()
    out = [
        fp2_mul(fp2_conj(c), g[i])
        for i, c in enumerate((c0, c1, c2, c3, c4, c5))
    ]
    return ((out[0], out[2], out[4]), (out[1], out[3], out[5]))


def fp12_frobenius_n(a, n: int):
    for _ in range(n % 12):
        a = fp12_frobenius(a)
    return a
