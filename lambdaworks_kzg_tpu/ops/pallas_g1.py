"""Fused BLS12-381 G1 group-law kernels in Pallas (TPU Mosaic).

Why this tier exists: the XLA tier (ops/g1_ops.py) materializes every
Montgomery multiply's [24, 24, B] partial-product tensor in HBM, so an
MSM is HBM-bandwidth-bound. Here a whole point operation (~16 Montgomery
muls) runs as ONE kernel: limbs live in vector registers / VMEM, HBM
traffic drops to the operand points themselves.

In-kernel representation: an Fp element is a uint32[24, B] block
(radix-2^16 limbs on sublanes, lanes = the point batch) — the same
layout as the XLA tier, so results are bit-identical and conversions are
free. The schoolbook product unrolls 24 broadcast multiply-accumulates
with static sublane slices; carries resolve via one branch-free
Kogge-Stone pass (same scheme as ops/limbs.normalize, proven exact).

The group-law formulas are shared with the XLA tier (ops/formulas.py).
Exceptional lanes (infinity / same-x) resolve with in-kernel selects; the
expensive doubling fixup (a full jacobian_dbl) hides behind an in-kernel
lax.cond — it never triggers on honest MSM traffic but stays bit-exact
when an adversarial input forces a same-x lane.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .field_ops import FP
from .formulas import jacobian_add_core, jacobian_dbl, jacobian_madd_core

L = FP.L  # 24 limbs of 16 bits
MASK = 0xFFFF  # Python int: jnp scalars would be captured constants in kernels

# Field constants, passed as one SMEM (4, 24) int32 input (Pallas kernels
# cannot capture array constants, and Mosaic cannot lane-broadcast [24, 1]
# VMEM vectors — scalars it can): N, N', 0xffff-N, 1 in Montgomery form.
_N = np.asarray(FP.N_limbs, dtype=np.int32)[:, 0]  # [24]
_NPRIME = np.asarray(FP.NPRIME_limbs, dtype=np.int32)[:, 0]
_NCOMP = (0xFFFF - _N).astype(np.int32)
_ONE_MONT = np.asarray(FP.ONE_limbs, dtype=np.int32)[:, 0]
_CONSTS = np.stack([_N, _NPRIME, _NCOMP, _ONE_MONT])  # [4, 24]

# Default lane tile. 512 = 4 vector registers wide; [24, 512] operand
# blocks keep the deepest live set of the madd formula well under VMEM.
TILE = 512


def _shift_up(x, k):
    """Shift limbs toward the MSB by k sublanes, zero-fill (static k)."""
    if k == 0:
        return x
    pad = jnp.zeros((k,) + x.shape[1:], dtype=x.dtype)
    return jnp.concatenate([pad, x[:-k]], axis=0)


def _carry(t):
    """Kogge-Stone carry resolution: limbs < 2^32 -> < 2^16 (mod 2^16L)."""
    nl = t.shape[0]
    s = t & MASK
    c = _shift_up(t >> 16, 1)
    raw = s + c
    g = raw >> 16
    p = ((raw & MASK) == MASK).astype(jnp.uint32)
    shift = 1
    while shift < nl:
        g = g | (p & _shift_up(g, shift))
        p = p & _shift_up(p, shift)
        shift *= 2
    return (raw + _shift_up(g, 1)) & MASK


def _place(x, offset, out_limbs):
    """Embed x's rows at [offset, offset+rows) in an out_limbs-row array.

    Concatenation of zero pads (no scatter: .at[] updates lower to ops
    Pallas kernels cannot capture)."""
    take = min(x.shape[0], out_limbs - offset)
    parts = []
    if offset:
        parts.append(jnp.zeros((offset,) + x.shape[1:], dtype=x.dtype))
    parts.append(x[:take])
    rem = out_limbs - offset - take
    if rem:
        parts.append(jnp.zeros((rem,) + x.shape[1:], dtype=x.dtype))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _mul_acc(a, b, out_limbs):
    """Unrolled schoolbook: a[la, B] * b[lb, B] -> [out_limbs, B] carried.

    Per-column accumulation stays < 2^22 (sum of <=2*lb 16-bit parts), so
    a single carry pass at the end is exact.
    """
    la = a.shape[0]
    lb = b.shape[0]
    acc = jnp.zeros((out_limbs,) + a.shape[1:], dtype=jnp.uint32)
    for j in range(lb):
        p = a * b[j : j + 1]  # u16*u16 fits u32 exactly
        lo_hi = min(la, out_limbs - j)
        if lo_hi > 0:
            acc = acc + _place(p[:lo_hi] & MASK, j, out_limbs)
        hi_hi = min(la, out_limbs - j - 1)
        if hi_hi > 0:
            acc = acc + _place(p[:hi_hi] >> 16, j + 1, out_limbs)
    return _carry(acc)


def _inc_limb0(x):
    """x + 1 in the least-significant limb (no scatter; full-shape iota —
    Mosaic cannot lane-broadcast [nl, 1] vectors)."""
    one = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) == 0).astype(
        jnp.uint32
    )
    return x + one


def _mul_acc_const(a, b_scalars, out_limbs):
    """Schoolbook multiply by a constant given as SMEM limb scalars."""
    la = a.shape[0]
    acc = jnp.zeros((out_limbs,) + a.shape[1:], dtype=jnp.uint32)
    for j, sc in enumerate(b_scalars):
        p = a * sc.astype(jnp.uint32)  # scalar broadcast
        lo_hi = min(la, out_limbs - j)
        if lo_hi > 0:
            acc = acc + _place(p[:lo_hi] & MASK, j, out_limbs)
        hi_hi = min(la, out_limbs - j - 1)
        if hi_hi > 0:
            acc = acc + _place(p[:hi_hi] >> 16, j + 1, out_limbs)
    return _carry(acc)


def _wide(scalars, b):
    """[24] SMEM scalars -> uint32[24, b] plane (scalar fills + concat)."""
    return jnp.concatenate(
        [jnp.full((1, b), sc, dtype=jnp.uint32) for sc in scalars], axis=0
    )


def _sqr_acc(a, out_limbs):
    """Schoolbook squaring: ~half the multiplies of _mul_acc.

    a^2 = sum_i a_i^2 4^... at 2i + 2 sum_{i<j} a_i a_j at i+j. The
    doubling happens on the 16-bit halves (< 2^17 each), so column
    accumulation stays < 2^23 — one carry pass remains exact.
    """
    la = a.shape[0]
    acc = jnp.zeros((out_limbs,) + a.shape[1:], dtype=jnp.uint32)
    for i in range(la):
        tail = a[i:]  # a_j for j >= i
        p = tail * a[i : i + 1]  # [la-i, B]
        lo = p & MASK
        hi = p >> 16
        # double the j > i terms (first row is the square term)
        dbl_mask = jnp.concatenate(
            [jnp.zeros((1,) + p.shape[1:], jnp.uint32),
             jnp.ones((p.shape[0] - 1,) + p.shape[1:], jnp.uint32)],
            axis=0,
        ) if p.shape[0] > 1 else jnp.zeros_like(p)
        lo = lo + lo * dbl_mask  # x or 2x, still < 2^17
        hi = hi + hi * dbl_mask
        off = 2 * i
        lo_take = min(lo.shape[0], out_limbs - off)
        if lo_take > 0:
            acc = acc + _place(lo[:lo_take], off, out_limbs)
        hi_take = min(hi.shape[0], out_limbs - off - 1)
        if hi_take > 0:
            acc = acc + _place(hi[:hi_take], off + 1, out_limbs)
    return _carry(acc)


def _carry_out(t):
    """Like _carry but on [nl+1] limbs, returning (carried[:nl], carry bit)."""
    nl = t.shape[0]
    padded = jnp.concatenate(
        [t, jnp.zeros((1,) + t.shape[1:], dtype=t.dtype)], axis=0
    )
    res = _carry(padded)
    return res[:nl], res[nl : nl + 1]


class _KernelFp:
    """Montgomery Fp ops on uint32[24, B] register arrays, in-kernel.

    Bound to the SMEM constants ref: per-limb scalars for the constant
    multiplies, widened [24, B] planes for the additive uses."""

    def __init__(self, s_ref, b):
        self.n_sc = [s_ref[0, j] for j in range(L)]
        self.np_sc = [s_ref[1, j] for j in range(L)]
        self.n_wide = _wide(self.n_sc, b)
        self.ncomp_wide = _wide([s_ref[2, j] for j in range(L)], b)
        self.one_wide = _wide([s_ref[3, j] for j in range(L)], b)

    def mul(self, a, b):
        t = _mul_acc(a, b, 2 * L)  # [48, B]
        m = _mul_acc_const(t[:L], self.np_sc, L)  # low product
        mn = _mul_acc_const(m, self.n_sc, 2 * L)
        u = _carry(t + mn)  # sums < 2^17; low L limbs zero
        u_hi = u[L:]
        return self._sub_n_if_ge(u_hi)

    def sqr(self, a):
        # NOTE: a schoolbook-squaring variant (_sqr_acc) was measured 13%
        # SLOWER in-kernel than plain mul — the ragged [la-i, B] slices
        # defeat Mosaic's tiling; the halved multiply count doesn't pay.
        return self.mul(a, a)

    def _sub_n_if_ge(self, x):
        """x < 2^384: return x - N if x >= N else x."""
        raw = _inc_limb0(x + self.ncomp_wide)
        d, ge = _carry_out(raw)  # carry-out <=> x >= N
        return jnp.where(ge > 0, d, x)

    def add(self, a, b):
        return self._sub_n_if_ge(_carry(a + b))

    def double(self, a):
        return self.add(a, a)

    def sub(self, a, b):
        comp = (MASK - b) + a  # a - b - 1 + 2^384 per-limb, no overflow
        raw = _inc_limb0(comp)
        d, ge = _carry_out(raw)  # carry-out <=> a >= b
        d_plus_n = _carry(d + self.n_wide)  # drops the 2^384 wrap
        return jnp.where(ge > 0, d, d_plus_n)

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=0, keepdims=True)  # [1, B]


def _sel(mask1b, a, b):
    """mask [1, B] ? a : b for [24, B] coordinate arrays."""
    return jnp.where(mask1b, a, b)


def _madd_kernel(consts_ref, bkt_ref, pts_ref, live_ref, out_ref):
    f = _KernelFp(consts_ref, bkt_ref.shape[-1])
    X1, Y1, Z1 = bkt_ref[0], bkt_ref[1], bkt_ref[2]
    X2, Y2 = pts_ref[0], pts_ref[1]
    live = live_ref[:] > 0  # [1, B]

    X3, Y3, Z3, H, Rr = jacobian_madd_core(f, X1, Y1, Z1, X2, Y2)

    p_inf = f.is_zero(Z1)
    h_zero = f.is_zero(H)
    r_zero = f.is_zero(Rr)
    active = live & ~p_inf
    do_dbl = active & h_zero & r_zero
    to_inf = active & h_zero & ~r_zero

    zero = jnp.zeros_like(X3)
    one_m = f.one_wide

    def fixup(coords):
        X3, Y3, Z3 = coords
        DX, DY, DZ = jacobian_dbl(f, X1, Y1, Z1)
        X3 = _sel(do_dbl, DX, X3)
        Y3 = _sel(do_dbl, DY, Y3)
        Z3 = _sel(do_dbl, DZ, Z3)
        X3 = _sel(to_inf, zero, X3)
        Y3 = _sel(to_inf, zero, Y3)
        Z3 = _sel(to_inf, zero, Z3)
        return X3, Y3, Z3

    X3, Y3, Z3 = jax.lax.cond(
        jnp.any(do_dbl | to_inf), fixup, lambda c: c, (X3, Y3, Z3)
    )
    # p infinite & q live -> lift q to Jacobian; q dead -> keep p
    lift = p_inf & live
    X3 = _sel(lift, X2, X3)
    Y3 = _sel(lift, Y2, Y3)
    Z3 = _sel(lift, one_m, Z3)
    X3 = _sel(~live, X1, X3)
    Y3 = _sel(~live, Y1, Y3)
    Z3 = _sel(~live, Z1, Z3)

    out_ref[0] = X3
    out_ref[1] = Y3
    out_ref[2] = Z3


def _add_kernel(consts_ref, p_ref, q_ref, out_ref):
    f = _KernelFp(consts_ref, p_ref.shape[-1])
    X1, Y1, Z1 = p_ref[0], p_ref[1], p_ref[2]
    X2, Y2, Z2 = q_ref[0], q_ref[1], q_ref[2]

    X3, Y3, Z3, H, Rr = jacobian_add_core(f, X1, Y1, Z1, X2, Y2, Z2)

    p_inf = f.is_zero(Z1)
    q_inf = f.is_zero(Z2)
    h_zero = f.is_zero(H)
    r_zero = f.is_zero(Rr)
    both = ~p_inf & ~q_inf
    do_dbl = both & h_zero & r_zero
    to_inf = both & h_zero & ~r_zero

    zero = jnp.zeros_like(X3)

    def fixup(coords):
        X3, Y3, Z3 = coords
        DX, DY, DZ = jacobian_dbl(f, X1, Y1, Z1)
        X3 = _sel(do_dbl, DX, X3)
        Y3 = _sel(do_dbl, DY, Y3)
        Z3 = _sel(do_dbl, DZ, Z3)
        X3 = _sel(to_inf, zero, X3)
        Y3 = _sel(to_inf, zero, Y3)
        Z3 = _sel(to_inf, zero, Z3)
        return X3, Y3, Z3

    X3, Y3, Z3 = jax.lax.cond(
        jnp.any(do_dbl | to_inf), fixup, lambda c: c, (X3, Y3, Z3)
    )
    X3 = _sel(p_inf, X2, X3)
    Y3 = _sel(p_inf, Y2, Y3)
    Z3 = _sel(p_inf, Z2, Z3)
    X3 = _sel(q_inf, X1, X3)
    Y3 = _sel(q_inf, Y1, Y3)
    Z3 = _sel(q_inf, Z1, Z3)

    out_ref[0] = X3
    out_ref[1] = Y3
    out_ref[2] = Z3


def _dbl_kernel(consts_ref, p_ref, out_ref):
    f = _KernelFp(consts_ref, p_ref.shape[-1])
    X3, Y3, Z3 = jacobian_dbl(f, p_ref[0], p_ref[1], p_ref[2])
    out_ref[0] = X3
    out_ref[1] = Y3
    out_ref[2] = Z3


def _lane_tile(m: int) -> int:
    t = min(TILE, m)
    while m % t:
        t //= 2
    return max(t, 128) if m % max(t, 128) == 0 else m


@functools.partial(jax.jit, static_argnames=("interpret",))
def madd(p, q_aff, q_valid, interpret: bool = False):
    """Mixed add, drop-in for ops/g1_ops.madd on [3, L, M] arrays.

    p: uint32[3, L, M] Jacobian; q_aff: uint32[2, L, M] affine Montgomery;
    q_valid: bool[M]. M must be a multiple of 128 (bucket grids are).
    """
    m = p.shape[-1]
    t = _lane_tile(m)
    live = q_valid.astype(jnp.uint32).reshape(1, m)
    return pl.pallas_call(
        _madd_kernel,
        grid=(m // t,),
        in_specs=[
            pl.BlockSpec((4, L), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((3, L, t), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, L, t), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, L, t), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, L, m), jnp.uint32),
        interpret=interpret,
    )(jnp.asarray(_CONSTS), p, q_aff, live)


@functools.partial(jax.jit, static_argnames=("interpret",))
def add(p, q, interpret: bool = False):
    """Complete Jacobian add, drop-in for ops/g1_ops.add on [3, L, M]."""
    m = p.shape[-1]
    t = _lane_tile(m)
    return pl.pallas_call(
        _add_kernel,
        grid=(m // t,),
        in_specs=[
            pl.BlockSpec((4, L), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((3, L, t), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, L, t), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, L, t), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, L, m), jnp.uint32),
        interpret=interpret,
    )(jnp.asarray(_CONSTS), p, q)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dbl(p, interpret: bool = False):
    """Jacobian doubling, drop-in for ops/g1_ops.dbl on [3, L, M]."""
    m = p.shape[-1]
    t = _lane_tile(m)
    return pl.pallas_call(
        _dbl_kernel,
        grid=(m // t,),
        in_specs=[
            pl.BlockSpec((4, L), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((3, L, t), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, L, t), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, L, m), jnp.uint32),
        interpret=interpret,
    )(jnp.asarray(_CONSTS), p)
