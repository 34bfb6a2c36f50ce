"""Pippenger multi-scalar multiplication on TPU (JAX/XLA).

The flagship kernel (SURVEY.md §2b "first-class distributed component"),
replacing lambdaworks `msm::pippenger::msm` behind `g1_lincomb`
(reference src/lib.rs:234-243) and `kzg.commit`.

TPU formulation (SIMD-friendly, no data-dependent scatter):
  1. window digits for all points                      [W, N]
  2. per-window argsort by digit (groups bucket members contiguously)
  3. bucket start offsets via vectorized searchsorted  [W, 2^c]
  4. bucket accumulation: all W*2^c buckets advance in lockstep on a
     flat lane axis M = W*2^c, each masked-mixed-adding its t-th member;
     the while_loop runs max-bucket-load times
  5. bucket reduction: suffix scan + pairwise tree, both as flat lane
     rolls masked at window boundaries (log2(2^c) rounds each)
  6. the W window sums return to the host for the final Horner combine
     (sequential 255 doublings — wrong shape for the VPU, trivial on host)

The multi-chip version shards steps 1-4 over points (parallel/) and
tree-combines per-device bucket arrays with point adds over ICI.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..host import curve as HC
from . import g1_ops as g1
from . import limbs as lb
from .dispatch import add as _add, dbl as _dbl, madd as _madd
from .field_ops import FR


def window_digits(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """scalars: uint32[16, N] plain Fr limbs -> digits uint32[W, N].

    W = ceil(256 / c); digit w = (scalar >> (c*w)) & (2^c - 1).
    Requires c <= 16 so a digit spans at most two 16-bit limbs.
    """
    assert 1 <= c <= 16
    n = scalars.shape[1]
    num_windows = (256 + c - 1) // c
    padded = jnp.concatenate(
        [scalars, jnp.zeros((1, n), dtype=jnp.uint32)], axis=0
    )
    outs = []
    mask = jnp.uint32((1 << c) - 1)
    for w in range(num_windows):
        bit = c * w
        k, s = bit // 16, bit % 16
        word = padded[k] | (padded[k + 1] << 16)
        outs.append((word >> s) & mask)
    return jnp.stack(outs, axis=0)


def bucket_accumulate(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    scalars: jnp.ndarray,
    c: int,
) -> jnp.ndarray:
    """Accumulate points into Pippenger buckets.

    points:  uint32[2, L, N] affine Montgomery
    valid:   bool[N] (False = infinity / padding)
    scalars: uint32[16, N] plain Fr limbs
    returns: uint32[3, L, M] Jacobian bucket sums, M = W * 2^c laid out
             m = w * 2^c + b (bucket 0 of each window is junk).
    """
    n = points.shape[-1]
    num_buckets = 1 << c
    digits = window_digits(scalars, c)  # [W, N]
    num_windows = digits.shape[0]

    # route invalid points and zero digits to bucket 0 (ignored later)
    digits = jnp.where(valid[None, :], digits, 0)

    if _top_window_split(c):
        # Fr scalars are < 2^255, so when c | 256 the top window's digits
        # are < 2^(c-1): only half its buckets can be occupied, doubling
        # their load — and the lockstep loop runs max-bucket-load times.
        # Route alternating points into the free upper half (aliases,
        # merged back in bucket_reduce), halving the top window's max.
        half = jnp.uint32(1 << (c - 1))
        parity = (jnp.arange(n, dtype=jnp.uint32) & 1) * half
        top = digits[-1]
        digits = digits.at[-1].set(jnp.where(top != 0, top + parity, 0))

    order = jnp.argsort(digits, axis=1)  # [W, N]
    sorted_digits = jnp.take_along_axis(digits, order, axis=1)

    bucket_ids = jnp.arange(num_buckets, dtype=sorted_digits.dtype)
    starts = jax.vmap(
        lambda sd: jnp.searchsorted(sd, bucket_ids, side="left")
    )(sorted_digits).astype(jnp.int32)  # [W, 2^c]
    ends = jnp.concatenate(
        [starts[:, 1:], jnp.full((num_windows, 1), n, dtype=jnp.int32)],
        axis=1,
    )
    counts = ends - starts
    max_load = jnp.max(counts[:, 1:])  # bucket 0 excluded

    m_total = num_windows * num_buckets
    buckets0 = g1.infinity_like((), m_total)
    live_bucket = (bucket_ids != 0)[None, :]  # [1, 2^c]

    # Point-major copy for the per-iteration gather: rows of 2*L
    # contiguous words instead of N-strided single words — the
    # minor-dim gather was as expensive as the madd itself at 2^20.
    points_rowmajor = jnp.transpose(points, (2, 0, 1))  # [N, 2, L]

    def body(carry):
        t, buckets = carry
        idx = starts + t  # [W, 2^c]
        live = jnp.logical_and(idx < ends, live_bucket)
        idx_c = jnp.minimum(idx, n - 1)
        pt_idx = jnp.take_along_axis(order, idx_c, axis=1)  # [W, 2^c]
        rows = jnp.take(points_rowmajor, pt_idx.reshape(-1), axis=0)
        gathered = jnp.transpose(rows, (1, 2, 0))  # [2, L, M]
        buckets = _madd(buckets, gathered, live.reshape(-1))
        return (t + 1, buckets)

    def cond(carry):
        t, _ = carry
        return t < max_load

    _, buckets = jax.lax.while_loop(cond, body, (jnp.int32(0), buckets0))
    return buckets


def _tree_sum_lanes(arr4: jnp.ndarray) -> jnp.ndarray:
    """Pairwise point-sum over the last (bucket) axis of [3, L, W, k]."""
    while arr4.shape[-1] > 1:
        k = arr4.shape[-1] // 2
        lo = _flat(arr4[..., :k])
        hi = _flat(arr4[..., k : 2 * k])
        arr4 = _add(lo, hi).reshape(arr4.shape[:-1] + (k,))
    return arr4[..., 0]  # [3, L, W]


def _flat(arr4: jnp.ndarray) -> jnp.ndarray:
    """[3, L, W, k] -> [3, L, W*k] (contiguous lane flatten)."""
    s = arr4.shape
    return arr4.reshape(s[:-2] + (s[-2] * s[-1],))


def _top_window_split(c: int) -> bool:
    """Whether bucket_accumulate aliases the top window's load into its
    unoccupied upper bucket half (see bucket_accumulate); bucket_reduce
    must merge the aliases back."""
    return 256 % c == 0


def bucket_reduce(buckets: jnp.ndarray, c: int) -> jnp.ndarray:
    """[3, L, M] buckets -> [3, L, W] window sums S_w = sum_b b*B_b.

    Two algorithms, selected by platform:
      * fold-reduce (TPU): ~5x less point-add work, but its ~3c distinct
        array shapes make the XLA *CPU* compile pathological (>30 min at
        c=8 vs seconds for the scan);
      * suffix-scan (CPU): two fori_loops with shape-invariant bodies —
        compiles in seconds, runtime only matters on real chips.
    Both are exact and produce identical bits (tests/test_curve.py).
    """
    from . import dispatch

    arr = _merge_top_aliases(_zero_bucket0(buckets, c), c)
    if dispatch.use_pallas():
        return _bucket_reduce_fold(arr, c)
    return _bucket_reduce_scan(arr, c)


def _zero_bucket0(buckets: jnp.ndarray, c: int) -> jnp.ndarray:
    """Neutralize bucket-0 lanes (invalid points route there; weight 0)."""
    b_idx = jnp.arange(buckets.shape[-1]) % (1 << c)
    return jnp.where((b_idx == 0)[None, None, :], 0, buckets)


def _merge_top_aliases(arr: jnp.ndarray, c: int) -> jnp.ndarray:
    """Merge the top window's alias lanes (bucket b's second copy lives
    at lane b + 2^(c-1); see bucket_accumulate)."""
    if not _top_window_split(c):
        return arr
    num_buckets = 1 << c
    w = arr.shape[-1] // num_buckets
    arr4 = arr.reshape(arr.shape[:-1] + (w, num_buckets))
    half = num_buckets // 2
    top = arr4[..., -1:, :]
    lo = top[..., :half]
    hi = top[..., half:]
    merged = _add(_flat(lo), _flat(hi)).reshape(lo.shape)
    top = jnp.concatenate([merged, jnp.zeros_like(hi)], axis=-1)
    arr4 = jnp.concatenate([arr4[..., :-1, :], top], axis=-2)
    return arr4.reshape(arr.shape)


def _bucket_reduce_fold(arr: jnp.ndarray, c: int) -> jnp.ndarray:
    """Fold-reduce: splitting the buckets at h = 2^(c-1) gives
      sum_b b*B_b = sum_{j<h} j*(B_j + B_{j+h}) + h * sum_{j<h} B_{j+h},
    so each round folds the bucket axis in half (h/2 point adds per
    window) and banks the high-half total E_r; the answer is the Horner
    combine sum_r 2^(c-r) * E_r. ~3*2^c adds per window vs ~2c*2^c for
    the scan, all on contiguous flattened lane blocks."""
    num_buckets = 1 << c
    w = arr.shape[-1] // num_buckets
    arr4 = arr.reshape(arr.shape[:-1] + (w, num_buckets))

    totals = []  # E_r = sum of the high half at round r
    h = num_buckets // 2
    while h >= 1:
        lo = arr4[..., :h]
        hi = arr4[..., h : 2 * h]
        totals.append(_tree_sum_lanes(hi))
        arr4 = _add(_flat(lo), _flat(hi)).reshape(lo.shape)
        h //= 2

    acc = totals[0]
    for e in totals[1:]:
        acc = _add(_dbl(acc), e)
    return acc  # [3, L, W]


def _bucket_reduce_scan(arr: jnp.ndarray, c: int) -> jnp.ndarray:
    """Suffix-scan reduce: S_w = sum_{b>=1} suffix_b with
    suffix_b = sum_{b'>=b} B_b'. Two fori_loops whose bodies roll the
    flat lane axis (masked at window boundaries) — shape-invariant, so
    the XLA CPU compile stays fast."""
    num_buckets = 1 << c
    m_total = arr.shape[-1]
    b_idx = jnp.arange(m_total) % num_buckets

    def scan_body(k, a):
        shift = jnp.int32(1) << k
        rolled = jnp.roll(a, -shift, axis=-1)
        live = (b_idx + shift) < num_buckets
        summed = _add(a, rolled)
        return jnp.where(live[None, None, :], summed, a)

    a = jax.lax.fori_loop(0, c, scan_body, arr)
    # lane (w, b) = suffix_b for b >= 1; zero the b = 0 junk lane so the
    # pairwise tree can use it as additive identity (all-zero == infinity)
    a = jnp.where((b_idx == 0)[None, None, :], 0, a)

    def tree_body(k, a):
        half = jnp.int32(num_buckets // 2) >> k
        rolled = jnp.roll(a, -half, axis=-1)
        live = b_idx < half
        summed = _add(a, rolled)
        return jnp.where(live[None, None, :], summed, a)

    a = jax.lax.fori_loop(0, c, tree_body, a)
    return a[..., ::num_buckets]  # lane (w, 0) holds S_w


@functools.partial(jax.jit, static_argnames=("c",))
def msm_device(points, valid, scalars, c: int = 8):
    """Full single-chip MSM kernel: returns window sums [3, L, W]."""
    return bucket_reduce(bucket_accumulate(points, valid, scalars, c), c)


def combine_windows_host(window_sums, c: int):
    """[3, L, W] device window sums -> host Jacobian point (Python ints)."""
    ws = g1.points_to_host(window_sums)
    ops = HC.FP_OPS
    acc = HC.infinity(ops)
    for w in range(len(ws) - 1, -1, -1):
        for _ in range(c):
            acc = HC.point_double(ops, acc)
        acc = HC.point_add(ops, acc, ws[w])
    return acc


def msm(points, valid, scalars, c: int = 8):
    """Single-chip MSM -> host Jacobian point."""
    return combine_windows_host(msm_device(points, valid, scalars, c), c)


def scalars_to_device(scalar_ints) -> jnp.ndarray:
    """Host list of ints (mod r) -> uint32[16, N] plain limb array."""
    return jnp.asarray(
        lb.ints_to_limbs([s % FR.modulus for s in scalar_ints], 16)
    )
