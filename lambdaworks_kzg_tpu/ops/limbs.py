"""Vectorized multi-limb big-integer arithmetic for TPU (JAX/XLA).

TPU-native replacement for the reference's `UnsignedInteger<N>` /
Montgomery field backend (lambdaworks-math, SURVEY.md §2b). Design:

  * Radix 2^16 limbs stored in uint32 arrays, little-endian limb order.
  * **Limbs-first layout [..., L, B]**: the batch axis is LAST so it maps
    onto the TPU's 128-wide vector lanes with zero padding waste; the
    limb axis (L = 16 for Fr, 24 for Fp) lives on sublanes. (The
    batch-last choice measured ~8x faster than [B, L] on v5e: with L on
    lanes every [.., 24]-shaped buffer pads to 128 lanes and all memory
    traffic quintuples.)
  * 16x16-bit partial products fit exactly in uint32 (the TPU has no
    64-bit ALU); schoolbook column sums use a pad/flatten/reshape skew
    (zero gathers) with lo/hi 16-bit splitting to stay below 2^32.
  * Carry normalization is a branch-free Kogge-Stone generate/propagate
    scan — log2(L) rounds, no data-dependent control flow (a while_loop
    here made XLA compiles balloon and broke shard_map replication).

Everything is shape-polymorphic over leading axes and the trailing batch
axis, and jit/vmap/shard_map friendly.
"""

import jax
import jax.numpy as jnp
import numpy as np

MASK16 = jnp.uint32(0xFFFF)


# ---------------------------------------------------------------------------
# host <-> device conversion helpers
# ---------------------------------------------------------------------------


def int_to_limbs(value: int, num_limbs: int) -> np.ndarray:
    """Python int -> uint32[num_limbs, 1] (broadcastable constant)."""
    out = np.zeros((num_limbs, 1), dtype=np.uint32)
    for i in range(num_limbs):
        out[i, 0] = (value >> (16 * i)) & 0xFFFF
    return out


def ints_to_limbs(values, num_limbs: int) -> np.ndarray:
    """Iterable of ints -> uint32[num_limbs, len] (limbs-first)."""
    out = np.zeros((num_limbs, len(values)), dtype=np.uint32)
    for j, v in enumerate(values):
        for i in range(num_limbs):
            out[i, j] = (v >> (16 * i)) & 0xFFFF
    return out


def limbs_to_int(limbs) -> int:
    """uint32[L] or [L, 1] -> int."""
    arr = np.asarray(limbs).reshape(-1)
    return sum(int(limb) << (16 * i) for i, limb in enumerate(arr))


def limbs_to_ints(limbs) -> list:
    """uint32[L, B] -> list of B ints."""
    arr = np.asarray(limbs)
    return [
        sum(int(arr[i, j]) << (16 * i) for i in range(arr.shape[0]))
        for j in range(arr.shape[1])
    ]


# ---------------------------------------------------------------------------
# carry handling
# ---------------------------------------------------------------------------


def _shift_up(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Shift limbs toward the MSB by k positions (axis -2), zero fill."""
    if k == 0:
        return x
    pad = jnp.zeros(x.shape[:-2] + (k,) + x.shape[-1:], dtype=x.dtype)
    return jnp.concatenate([pad, x[..., :-k, :]], axis=-2)


def normalize(t: jnp.ndarray) -> jnp.ndarray:
    """Reduce limbs (axis -2) to < 2^16 with exact carry propagation.

    Input limbs may hold values up to 2^32-1. One carry-save round turns
    the input into a sum of two sub-2^16 addends; a Kogge-Stone
    generate/propagate scan (log2(L) rounds) resolves all carries.
    Carry out of the most-significant limb is dropped (mod 2^(16 L)).
    """
    L = t.shape[-2]
    s = t & MASK16
    c = _shift_up(t >> 16, 1)
    raw = s + c  # < 2^17
    g = raw >> 16  # generate (0/1)
    p = ((raw & MASK16) == MASK16).astype(jnp.uint32)  # propagate (0/1)
    shift = 1
    while shift < L:
        g = g | (p & _shift_up(g, shift))
        p = p & _shift_up(p, shift)
        shift *= 2
    return (raw + _shift_up(g, 1)) & MASK16


# ---------------------------------------------------------------------------
# multiplication
# ---------------------------------------------------------------------------


def _skew_colsum(rows: jnp.ndarray, lead: int) -> jnp.ndarray:
    """Column sums of rows shifted by their row index (axes -3/-2):
    out[..., k, :] = sum_i rows[..., i, k - i - lead, :].

    Pad each row (axis -2) to width 2L+1 with `lead` leading zeros,
    flatten (row, col) and re-view with a width-2L stride: row i of the
    new view is row i shifted right by exactly i, neighbors contribute
    only zero padding. Pure reshapes — no gathers, no dynamic slices.
    """
    L = rows.shape[-3]
    width = rows.shape[-2]
    target = 2 * L
    pad = [(0, 0)] * (rows.ndim - 2) + [
        (lead, target + 1 - width - lead),
        (0, 0),
    ]
    padded = jnp.pad(rows, pad)  # [..., L, 2L+1, B]
    B = padded.shape[-1]
    flat = padded.reshape(padded.shape[:-3] + (L * (target + 1), B))
    flat = flat[..., : L * target, :]
    skewed = flat.reshape(flat.shape[:-2] + (L, target, B))
    return jnp.sum(skewed, axis=-3, dtype=jnp.uint32)


def mul_wide(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[..., L, B] x [..., L, B] -> [..., 2L, B] full product, normalized.

    Partial products are split into 16-bit halves before column
    accumulation so sums stay < 2^22 (L <= 24) — far from u32 overflow.
    """
    prod = a[..., :, None, :] * b[..., None, :, :]  # [..., L, L, B]
    cols = _skew_colsum(prod & MASK16, 0) + _skew_colsum(prod >> 16, 1)
    return normalize(cols)


def mul_low(a: jnp.ndarray, b: jnp.ndarray, out_limbs: int) -> jnp.ndarray:
    """Low `out_limbs` limbs of a*b (the product mod 2^(16*out_limbs))."""
    return mul_wide(a, b)[..., :out_limbs, :]


# ---------------------------------------------------------------------------
# add / sub / compare / select
# ---------------------------------------------------------------------------


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Limb-wise add, normalized (mod 2^(16 L))."""
    return normalize(a + b)


def compare_ge(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a >= b lexicographically (both normalized). Returns bool [..., B]."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    L = a.shape[-2]
    diff = a != b
    idx = jnp.where(diff, jnp.arange(L, dtype=jnp.int32)[:, None], -1)
    top = jnp.max(idx, axis=-2)  # [..., B]; -1 if equal
    safe_top = jnp.maximum(top, 0)
    a_top = jnp.take_along_axis(a, safe_top[..., None, :], axis=-2)[..., 0, :]
    b_top = jnp.take_along_axis(b, safe_top[..., None, :], axis=-2)[..., 0, :]
    return jnp.where(top < 0, True, a_top >= b_top)


def sub_mod_pow2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod 2^(16 L), both normalized."""
    comp = MASK16 - b  # per-limb complement: no borrows
    t = a + comp
    t = t.at[..., 0, :].add(1)
    return normalize(t)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """mask ? a : b; mask shaped [..., B] (broadcast over the limb axis)."""
    return jnp.where(mask[..., None, :], a, b)
