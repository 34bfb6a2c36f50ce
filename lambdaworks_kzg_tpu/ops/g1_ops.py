"""Batched BLS12-381 G1 group law on TPU (JAX/XLA).

TPU-native replacement for lambdaworks-math's
`ShortWeierstrassProjectivePoint` ops (SURVEY.md §2b). Points are Jacobian
(X, Y, Z) with coordinates in Montgomery form, stored limbs-first as one
uint32 [..., 3, L, B] array (coordinate axis, limb axis, batch-on-lanes;
see ops/limbs.py for the layout rationale). Infinity is Z == 0.

Branches (infinity, equal, opposite) are resolved with vectorized selects;
the expensive doubling/cancellation fixups are gated behind a scalar
`lax.cond` because they virtually never trigger in honest MSM traffic —
results remain bit-exact when they do. BLS12-381 G1 has no 2-torsion (odd
group order), so Y == 0 never occurs on-curve and doubling needs no
special case.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..host import curve as HC
from . import limbs as lb
from .field_ops import FP
from .formulas import jacobian_add_core, jacobian_dbl, jacobian_madd_core

L = FP.L  # 24


def make_points_host(affine_list) -> tuple:
    """Host affine [(x, y) | None, ...] -> (uint32[2, L, N] Montgomery
    affine coords, valid mask bool[N]). Infinity rows are zeros."""
    xs, ys, valid = [], [], []
    for pt in affine_list:
        if pt is None:
            xs.append(0)
            ys.append(0)
            valid.append(False)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            valid.append(True)
    out = np.zeros((2, L, len(affine_list)), dtype=np.uint32)
    out[0] = FP.to_mont_host(xs)
    out[1] = FP.to_mont_host(ys)
    return jnp.asarray(out), jnp.asarray(np.asarray(valid))


def points_to_host(points) -> list:
    """Device Jacobian [3, L, B] (or [..., 3, L, B]) Montgomery ->
    list of host Jacobian int tuples (X, Y, Z)."""
    arr = np.asarray(points)
    arr = arr.reshape((-1,) + arr.shape[-3:])  # [G, 3, L, B]
    out = []
    for g in range(arr.shape[0]):
        xs = FP.from_mont_host(arr[g, 0])
        ys = FP.from_mont_host(arr[g, 1])
        zs = FP.from_mont_host(arr[g, 2])
        out.extend(zip(xs, ys, zs))
    return out


def infinity_like(shape_prefix, batch: int) -> jnp.ndarray:
    return jnp.zeros(tuple(shape_prefix) + (3, L, batch), dtype=jnp.uint32)


def is_infinity(p) -> jnp.ndarray:
    return FP.is_zero(p[..., 2, :, :])


def _sel_pt(mask, a, b):
    """mask ? a : b over [..., 3, L, B] point arrays; mask [..., B]."""
    return jnp.where(mask[..., None, None, :], a, b)


def dbl(p: jnp.ndarray) -> jnp.ndarray:
    """Jacobian doubling (dbl-2009-l, a=0). Handles infinity for free."""
    X, Y, Z = p[..., 0, :, :], p[..., 1, :, :], p[..., 2, :, :]
    X3, Y3, Z3 = jacobian_dbl(FP, X, Y, Z)
    return jnp.stack([X3, Y3, Z3], axis=-3)


def add(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Complete Jacobian + Jacobian addition (add-2007-bl + selects)."""
    f = FP
    X1, Y1, Z1 = p[..., 0, :, :], p[..., 1, :, :], p[..., 2, :, :]
    X2, Y2, Z2 = q[..., 0, :, :], q[..., 1, :, :], q[..., 2, :, :]
    X3, Y3, Z3, H, Rr = jacobian_add_core(f, X1, Y1, Z1, X2, Y2, Z2)
    out = jnp.stack([X3, Y3, Z3], axis=-3)

    h_zero = f.is_zero(H)
    r_zero = f.is_zero(Rr)
    p_inf = is_infinity(p)
    q_inf = is_infinity(q)
    both = jnp.logical_and(jnp.logical_not(p_inf), jnp.logical_not(q_inf))
    exceptional = jnp.logical_and(both, h_zero)

    def fixup(out):
        # same x: double if same y, else infinity
        out = _sel_pt(jnp.logical_and(exceptional, r_zero), dbl(p), out)
        out = _sel_pt(
            jnp.logical_and(exceptional, jnp.logical_not(r_zero)),
            jnp.zeros_like(out),
            out,
        )
        return out

    out = jax.lax.cond(jnp.any(exceptional), fixup, lambda o: o, out)
    out = _sel_pt(p_inf, q, out)
    out = _sel_pt(q_inf, p, out)
    return out


def madd(p: jnp.ndarray, q_aff: jnp.ndarray, q_valid) -> jnp.ndarray:
    """Complete mixed addition: Jacobian p + affine q (madd-2007-bl).

    q_aff: [..., 2, L, B] Montgomery affine coords; q_valid: bool [..., B]
    (False means q is infinity).
    """
    f = FP
    X1, Y1, Z1 = p[..., 0, :, :], p[..., 1, :, :], p[..., 2, :, :]
    X2, Y2 = q_aff[..., 0, :, :], q_aff[..., 1, :, :]
    X3, Y3, Z3, H, Rr = jacobian_madd_core(f, X1, Y1, Z1, X2, Y2)
    out = jnp.stack([X3, Y3, Z3], axis=-3)

    h_zero = f.is_zero(H)
    r_zero = f.is_zero(Rr)
    p_inf = is_infinity(p)
    q_valid = jnp.asarray(q_valid)
    live = jnp.logical_and(q_valid, jnp.logical_not(p_inf))
    exceptional = jnp.logical_and(live, h_zero)

    def fixup(out):
        out = _sel_pt(jnp.logical_and(exceptional, r_zero), dbl(p), out)
        out = _sel_pt(
            jnp.logical_and(exceptional, jnp.logical_not(r_zero)),
            jnp.zeros_like(out),
            out,
        )
        return out

    out = jax.lax.cond(jnp.any(exceptional), fixup, lambda o: o, out)
    # p infinite -> lift q to Jacobian (Z = 1_mont); q invalid -> p
    one = jnp.broadcast_to(FP.ONE_limbs, X1.shape).astype(jnp.uint32)
    q_jac = jnp.stack([X2, Y2, one], axis=-3)
    out = _sel_pt(jnp.logical_and(p_inf, q_valid), q_jac, out)
    out = _sel_pt(jnp.logical_not(q_valid), p, out)
    return out


# -- host-reference helpers for tests ---------------------------------------


def points_eq_host(device_pt, host_jac) -> bool:
    """Compare one device Jacobian point [3, L] or [3, L, 1] against a host
    Jacobian point."""
    arr = np.asarray(device_pt).reshape(3, L, 1)
    (x, y, z) = points_to_host(arr)[0]
    return HC.points_eq(HC.FP_OPS, (x, y, z), host_jac)
