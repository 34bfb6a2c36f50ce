"""Fused BLS12-381 G1 kernels, v2 layout: limbs on the leading axis.

v1 (ops/pallas_g1.py) keeps an Fp element as uint32[24, B]: limbs live on
SUBLANES, so every limb shift/place in the schoolbook product and the
Kogge-Stone carry is a real sublane-shuffle/concat Mosaic must execute.
Measured on v5e, the madd kernel ran at 66.8 ns/lane — ~7x its raw
op-count at the probed VPU rates (scripts/exp_kernel_probe.py: u32
multiply IS full rate; the gap is all data movement).

v2 keeps an Fp element as uint32[24, S, 128]: the batch fills whole
(sublane, lane) = (S, 128) vector registers and the LIMB index is the
leading, vreg-granular axis. Every `_place`/carry shift becomes a
Python-level row concat — register renaming, zero lane movement. The
arithmetic (schoolbook radix-2^16 + one Kogge-Stone pass, Montgomery
REDC, borrow-free sub) is bit-identical to v1/ops/field_ops.

Wrappers reshape the [3, L, M] wire layout to [3, L, G, S, 128] blocks
(a minor-dim split: free) and grid over G; M must be a multiple of 128
(dispatch pads lanes to the {512, 1024, ...} ladder).

Replaces the MSM/bucket-reduce inner loops behind ops/dispatch.py
(reference hot path: g1_lincomb / msm::pippenger::msm, src/lib.rs:234-243).
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
MASK = 0xFFFF

# Field constants, passed as one SMEM (4, 24) int32 input (Pallas
# kernels cannot capture array constants — same contract as v1):
# N, N', 0xffff-N, 1 in Montgomery form.
_N = np.asarray(FP.N_limbs, dtype=np.int32)[:, 0]  # [24]
_NPRIME = np.asarray(FP.NPRIME_limbs, dtype=np.int32)[:, 0]
_NCOMP = (MASK - _N).astype(np.int32)
_ONE_MONT = np.asarray(FP.ONE_limbs, dtype=np.int32)[:, 0]
_CONSTS = np.stack([_N, _NPRIME, _NCOMP, _ONE_MONT])  # [4, 24]


def _shift_up(x, k):
    """Shift rows toward the MSB limb by k (leading axis): free renames."""
    if k == 0:
        return x
    pad = jnp.zeros((k,) + x.shape[1:], dtype=x.dtype)
    return jnp.concatenate([pad, x[:-k]], axis=0)


def _carry(t):
    """Kogge-Stone carry: limbs < 2^32 -> < 2^16 (mod 2^16L). Same math
    as v1/ops/limbs.normalize; shifts are row renames here."""
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
    """Rows of x placed at [offset, offset+rows) among zeros (free)."""
    take = min(x.shape[0], out_limbs - offset)
    parts = []
    if offset:
        parts.append(jnp.zeros((offset,) + x.shape[1:], dtype=x.dtype))
    parts.append(x[:take])
    rem = out_limbs - offset - take
    if rem:
        parts.append(jnp.zeros((rem,) + x.shape[1:], dtype=x.dtype))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _acc_band(acc, p, j, out_limbs):
    """acc[j : j+la+1] += (p & MASK) + (p >> 16 shifted one row up).

    The two 16-bit halves of the product column are pre-combined into one
    (la+1)-row band (row sums < 2^17 + band accumulation headroom — see
    _mul_acc bound) and added into the matching row SLICE of acc; rows
    outside the band are untouched concat renames. The previous
    formulation added two full out_limbs-row zero-padded arrays per j —
    twice the VPU add work for the same result (the adds dominate the
    schoolbook op mix; measured ~10%+ off the madd kernel)."""
    la = p.shape[0]
    band_n = min(la + 1, out_limbs - j)
    lo = p & MASK
    hi = p >> 16
    rows = [lo[:1]]  # band row 0 = lo[0]
    mid_n = min(band_n, la) - 1  # band rows 1..la-1 = lo[i] + hi[i-1]
    if mid_n > 0:
        rows.append(lo[1 : 1 + mid_n] + hi[:mid_n])
    if band_n == la + 1:  # band row la = hi[la-1]
        rows.append(hi[la - 1 : la])
    band = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
    seg = acc[j : j + band_n] + band
    parts = []
    if j:
        parts.append(acc[:j])
    parts.append(seg)
    if j + band_n < out_limbs:
        parts.append(acc[j + band_n :])
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _mul_acc(a, b, out_limbs):
    """Schoolbook a[la,...] * b[lb,...] -> [out_limbs, ...] carried.

    Column accumulation < 2^22 (sum of <= 2*lb 16-bit parts, each
    band-combined pair < 2^17): one carry pass at the end is exact (same
    bound argument as v1)."""
    acc = jnp.zeros((out_limbs,) + a.shape[1:], dtype=jnp.uint32)
    for j in range(b.shape[0]):
        p = a * b[j : j + 1]  # u16*u16 fits u32 exactly
        acc = _acc_band(acc, p, j, out_limbs)
    return _carry(acc)


def _mul_acc_const(a, const_scalars, out_limbs):
    """Schoolbook multiply by per-limb SMEM scalar constants."""
    acc = jnp.zeros((out_limbs,) + a.shape[1:], dtype=jnp.uint32)
    for j, cj in enumerate(const_scalars):
        p = a * cj.astype(jnp.uint32)
        acc = _acc_band(acc, p, j, out_limbs)
    return _carry(acc)


def _inc_limb0(x):
    """x + 1 in the least-significant limb."""
    one = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) == 0).astype(
        jnp.uint32
    )
    return x + one


def _carry_out(t):
    """_carry on [nl+1] rows -> (carried[:nl], carry bit [1, ...])."""
    nl = t.shape[0]
    padded = jnp.concatenate(
        [t, jnp.zeros((1,) + t.shape[1:], dtype=t.dtype)], axis=0
    )
    res = _carry(padded)
    return res[:nl], res[nl : nl + 1]


def _wide(scalars, trail):
    """Per-limb SMEM scalars -> uint32[L, *trail] plane (scalar fills)."""
    return jnp.concatenate(
        [jnp.full((1,) + trail, sc.astype(jnp.uint32)) for sc in scalars],
        axis=0,
    )


class _KernelFp:
    """Montgomery Fp ops on uint32[24, S, 128] register arrays."""

    def __init__(self, s_ref, trail):
        self.n_sc = [s_ref[0, j] for j in range(L)]
        self.np_sc = [s_ref[1, j] for j in range(L)]
        self.n_wide = _wide(self.n_sc, trail)
        self.ncomp_wide = _wide([s_ref[2, j] for j in range(L)], trail)
        self.one_wide = _wide([s_ref[3, j] for j in range(L)], trail)

    def mul(self, a, b):
        t = _mul_acc(a, b, 2 * L)  # [48, ...]
        m = _mul_acc_const(t[:L], self.np_sc, L)  # low product
        mn = _mul_acc_const(m, self.n_sc, 2 * L)
        u = _carry(t + mn)  # sums < 2^17; low L limbs zero
        return self._sub_n_if_ge(u[L:])

    def sqr(self, a):
        return self.mul(a, a)

    def _sub_n_if_ge(self, x):
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
        return jnp.all(a == 0, axis=0, keepdims=True)  # [1, S, 128]


def _sel(mask1, a, b):
    return jnp.where(mask1, a, b)


def _madd_kernel(consts_ref, bkt_ref, pts_ref, live_ref, out_ref):
    f = _KernelFp(consts_ref, bkt_ref.shape[-2:])
    X1 = bkt_ref[0, :, 0]
    Y1 = bkt_ref[1, :, 0]
    Z1 = bkt_ref[2, :, 0]
    X2 = pts_ref[0, :, 0]
    Y2 = pts_ref[1, :, 0]
    live = live_ref[0] > 0  # [S, 128] -> broadcasts against [24, S, 128]

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
    lift = p_inf & live
    X3 = _sel(lift, X2, X3)
    Y3 = _sel(lift, Y2, Y3)
    Z3 = _sel(lift, one_m, Z3)
    X3 = _sel(~live, X1, X3)
    Y3 = _sel(~live, Y1, Y3)
    Z3 = _sel(~live, Z1, Z3)

    out_ref[0, :, 0] = X3
    out_ref[1, :, 0] = Y3
    out_ref[2, :, 0] = Z3


def _add_kernel(consts_ref, p_ref, q_ref, out_ref):
    f = _KernelFp(consts_ref, p_ref.shape[-2:])
    X1 = p_ref[0, :, 0]
    Y1 = p_ref[1, :, 0]
    Z1 = p_ref[2, :, 0]
    X2 = q_ref[0, :, 0]
    Y2 = q_ref[1, :, 0]
    Z2 = q_ref[2, :, 0]

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

    out_ref[0, :, 0] = X3
    out_ref[1, :, 0] = Y3
    out_ref[2, :, 0] = Z3


def _dbl_kernel(consts_ref, p_ref, out_ref):
    f = _KernelFp(consts_ref, p_ref.shape[-2:])
    X3, Y3, Z3 = jacobian_dbl(f, p_ref[0, :, 0], p_ref[1, :, 0],
                              p_ref[2, :, 0])
    out_ref[0, :, 0] = X3
    out_ref[1, :, 0] = Y3
    out_ref[2, :, 0] = Z3


def _geom(m: int):
    """M lanes -> (G grid steps, S sublanes): 1024-lane blocks when M
    allows, one (M/128)-sublane block otherwise."""
    assert m % 128 == 0, m
    s = 8 if m % 1024 == 0 else m // 128
    return m // (s * 128), s


def _to_blocks(arr, g, s):
    """[C, L, M] -> [C, L, G, S, 128]: minor-dim split, no data movement."""
    c, l, m = arr.shape
    return arr.reshape(c, l, g, s, 128)


def _spec(c, s):
    return pl.BlockSpec(
        (c, L, 1, s, 128),
        lambda i: (0, 0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _out_spec(s):
    return pl.BlockSpec(
        (3, L, 1, s, 128),
        lambda i: (0, 0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def madd(p, q_aff, q_valid, interpret: bool = False):
    """Mixed add on [3, L, M] / [2, L, M] / bool[M]; M % 128 == 0."""
    m = p.shape[-1]
    g, s = _geom(m)
    live = q_valid.astype(jnp.uint32).reshape(g, 1, s, 128)
    out = pl.pallas_call(
        _madd_kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((4, L), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            _spec(3, s),
            _spec(2, s),
            pl.BlockSpec((1, 1, s, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=_out_spec(s),
        out_shape=jax.ShapeDtypeStruct((3, L, g, s, 128), jnp.uint32),
        interpret=interpret,
    )(jnp.asarray(_CONSTS), _to_blocks(p, g, s), _to_blocks(q_aff, g, s), live)
    return out.reshape(3, L, m)


@functools.partial(jax.jit, static_argnames=("interpret",))
def add(p, q, interpret: bool = False):
    """Complete Jacobian add on [3, L, M] arrays; M % 128 == 0."""
    m = p.shape[-1]
    g, s = _geom(m)
    out = pl.pallas_call(
        _add_kernel,
        grid=(g,),
        in_specs=[pl.BlockSpec((4, L), lambda i: (0, 0), memory_space=pltpu.SMEM), _spec(3, s), _spec(3, s)],
        out_specs=_out_spec(s),
        out_shape=jax.ShapeDtypeStruct((3, L, g, s, 128), jnp.uint32),
        interpret=interpret,
    )(jnp.asarray(_CONSTS), _to_blocks(p, g, s), _to_blocks(q, g, s))
    return out.reshape(3, L, m)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dbl(p, interpret: bool = False):
    """Jacobian doubling on [3, L, M]; M % 128 == 0."""
    m = p.shape[-1]
    g, s = _geom(m)
    out = pl.pallas_call(
        _dbl_kernel,
        grid=(g,),
        in_specs=[pl.BlockSpec((4, L), lambda i: (0, 0), memory_space=pltpu.SMEM), _spec(3, s)],
        out_specs=_out_spec(s),
        out_shape=jax.ShapeDtypeStruct((3, L, g, s, 128), jnp.uint32),
        interpret=interpret,
    )(jnp.asarray(_CONSTS), _to_blocks(p, g, s))
    return out.reshape(3, L, m)
