"""Batched G2 (twist) group law + fast subgroup check on device.

Moves the G2 side of SURVEY.md §2b row 5 onto the TPU: the SAME
field-agnostic Jacobian formulas as G1 (ops/formulas.py), instantiated
over ops/fp2_ops.FP2 — one audited group law for both groups, now at
both tiers (the host mirror is host/curve.FieldOps). Points are
uint32[3, 2, L, B]: (X, Y, Z) Jacobian with Fp2 Montgomery coordinates;
infinity is Z == (0, 0).

Used for batched setup-loading subgroup checks (65 G2 points; the
reference checks none, src/compression.rs:105-139 — we follow c-kzg and
check) and as the operand prep for a future vmapped Miller loop.
Differential-tested against host/curve.py in tests/test_fp2_ops.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import BLS_X, PSI_X, PSI_Y
from ..host import curve as HC
from . import fp2_ops as F2
from .formulas import jacobian_add_core, jacobian_dbl

L = F2.L


def make_points_host(affine_list):
    """[( (x0,x1), (y0,y1) ) | None, ...] -> (uint32[2, 2, L, B] affine
    Montgomery coords, valid bool[B])."""
    xs, ys, valid = [], [], []
    for pt in affine_list:
        if pt is None:
            xs.append((0, 0))
            ys.append((0, 0))
            valid.append(False)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            valid.append(True)
    return (
        jnp.asarray(np.stack([F2.from_host(xs), F2.from_host(ys)])),
        jnp.asarray(np.asarray(valid)),
    )


def lift_affine(points_aff, valid):
    """[2, 2, L, B] affine + mask -> [3, 2, L, B] Jacobian.

    Z = 1 in Montgomery: component 0 = ONE_MONT, component 1 = 0;
    invalid lanes get Z = 0 (infinity)."""
    from .field_ops import FP

    b = points_aff.shape[-1]
    z0 = jnp.broadcast_to(FP.ONE_limbs, (L, b)).astype(jnp.uint32)
    z = jnp.stack([jnp.where(valid[None, :], z0, 0), jnp.zeros_like(z0)])
    return jnp.concatenate([points_aff, z[None]], axis=0)


def points_to_host(points):
    """[3, 2, L, B] -> list of host Jacobian ((x0,x1),(y0,y1),(z0,z1))."""
    arr = np.asarray(points)
    xs = F2.to_host(arr[0])
    ys = F2.to_host(arr[1])
    zs = F2.to_host(arr[2])
    return list(zip(xs, ys, zs))


def is_infinity(p):
    return F2.is_zero(p[2])


def _sel_pt(mask, a, b):
    return jnp.where(mask[None, None, None, :], a, b)


def dbl(p):
    X3, Y3, Z3 = jacobian_dbl(F2.FP2, p[0], p[1], p[2])
    return jnp.stack([X3, Y3, Z3])


def add(p, q):
    """Complete Jacobian + Jacobian addition on the twist."""
    f = F2.FP2
    X3, Y3, Z3, H, Rr = jacobian_add_core(
        f, p[0], p[1], p[2], q[0], q[1], q[2]
    )
    out = jnp.stack([X3, Y3, Z3])
    h_zero = f.is_zero(H)
    r_zero = f.is_zero(Rr)
    p_inf = is_infinity(p)
    q_inf = is_infinity(q)
    both = ~p_inf & ~q_inf
    exceptional = both & h_zero

    def fixup(out):
        out = _sel_pt(exceptional & r_zero, dbl(p), out)
        out = _sel_pt(exceptional & ~r_zero, jnp.zeros_like(out), out)
        return out

    out = jax.lax.cond(jnp.any(exceptional), fixup, lambda o: o, out)
    out = _sel_pt(p_inf, q, out)
    out = _sel_pt(q_inf, p, out)
    return out


@functools.partial(jax.jit, static_argnames=("k",))
def scalar_mul_fixed(points_jac, k: int):
    """[k]Q for a host-known scalar, batched (double-and-add)."""
    nbits = max(k.bit_length(), 1)
    bits = jnp.asarray([(k >> i) & 1 for i in range(nbits)], dtype=jnp.uint32)

    def body(i, carry):
        acc, base = carry
        added = add(acc, base)
        take = jnp.broadcast_to(bits[i].astype(bool), acc.shape[-1:])
        acc = jnp.where(take[None, None, None, :], added, acc)
        base = dbl(base)
        return (acc, base)

    acc0 = jnp.zeros_like(points_jac)
    acc, _ = jax.lax.fori_loop(0, nbits, body, (acc0, points_jac))
    return acc


_PSI_CONSTS = None  # NUMPY: cached jnp constants created inside a
# trace leak tracers into later traces (see g1_batch._beta_mont)


def _psi_consts():
    global _PSI_CONSTS
    if _PSI_CONSTS is None:
        _PSI_CONSTS = (F2.from_host([PSI_X]), F2.from_host([PSI_Y]))
    return _PSI_CONSTS


@jax.jit
def _jacobian_eq_mask(p, q):
    """bool[B]: p == q as twist points (cross-multiplied)."""
    f = F2.FP2
    Z11, Z22 = f.sqr(p[2]), f.sqr(q[2])
    ex = f.eq(f.mul(p[0], Z22), f.mul(q[0], Z11))
    ey = f.eq(
        f.mul(f.mul(p[1], q[2]), Z22), f.mul(f.mul(q[1], p[2]), Z11)
    )
    inf1, inf2 = is_infinity(p), is_infinity(q)
    either = inf1 | inf2
    return jnp.where(either, inf1 == inf2, ex & ey)


@jax.jit
def subgroup_mask(points_jac):
    """bool[B]: Q in G2, batched fast endomorphism check:
    psi(Q) == -[|x|]Q with psi = (PSI_X*conj(x), PSI_Y*conj(y)) acting
    as the (negative) BLS parameter — one 64-bit lockstep scalar mul
    instead of the definitional 255-bit [r]Q. Constants/derivation:
    constants.py; host mirror host/curve._g2_in_subgroup_fast."""
    x_abs = -BLS_X
    xQ = scalar_mul_fixed(points_jac, x_abs)
    neg_xQ = jnp.stack([xQ[0], F2.neg(xQ[1]), xQ[2]])
    px, py = _psi_consts()
    b = points_jac.shape[-1]
    pxw = jnp.broadcast_to(px, (2, L, b))
    pyw = jnp.broadcast_to(py, (2, L, b))
    # psi on Jacobian coords: (x, y, z) -> (PSI_X*conj(x)*?, ...) — work
    # in affine semantics via Z-cofactors: psi(X/Z^2, Y/Z^3) =
    # (PSI_X*conj(X)/conj(Z)^2, PSI_Y*conj(Y)/conj(Z)^3), i.e. the
    # Jacobian point (PSI_X*conj(X), PSI_Y*conj(Y), conj(Z)).
    psi = jnp.stack(
        [
            F2.mul(pxw, F2.conj(points_jac[0])),
            F2.mul(pyw, F2.conj(points_jac[1])),
            F2.conj(points_jac[2]),
        ]
    )
    return _jacobian_eq_mask(psi, neg_xQ)


def subgroup_mask_definitional(points_jac):
    """bool[B]: [r]Q == infinity (oracle for differential tests)."""
    from ..constants import R

    return is_infinity(scalar_mul_fixed(points_jac, R))
