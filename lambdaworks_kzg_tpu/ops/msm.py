"""Pippenger multi-scalar multiplication on TPU (JAX/XLA).

The flagship kernel (SURVEY.md §2b "first-class distributed component"),
replacing lambdaworks `msm::pippenger::msm` behind `g1_lincomb`
(reference src/lib.rs:234-243) and `kzg.commit`.

TPU formulation (SIMD-friendly, no data-dependent scatter):
  1. window digits for all points [W, N]; the top window's load is
     round-robined across its unoccupied upper buckets (any c — see
     _top_bits), so non-dividing window sizes stay viable
  2. per-window STABLE sort by digit (single-array packed-key sort on
     TPU — digit << log2(N) | index; argsort on CPU)
  3. bucket start offsets via vectorized searchsorted  [W, 2^c]
  4. bucket accumulation: buckets advance in lockstep on flat lane
     grids of <= _GROUP_LANES lanes (windows grouped; each group runs
     to ITS own max bucket load under a lax.scan); members arrive via
     CHUNKED BULK gathers (one big take per CHUNK slots — bulk takes
     amortize XLA's per-row gather overhead), then CHUNK
     contiguous-slice madds per round
  5. bucket reduction: suffix scan + pairwise tree, both as flat lane
     rolls masked at window boundaries, every round at the SAME [3,L,M]
     shape (one compiled kernel; see ops/dispatch.py on Mosaic compile
     cost per shape)
  6. the W window sums return to the host for the final Horner combine
     (sequential 255 doublings — wrong shape for the VPU, trivial on host)

The multi-chip version shards steps 1-4 over points (parallel/) and
tree-combines per-device bucket arrays with point adds over ICI. For the
FIXED SRS basis, the fixed-base variant below removes the Horner combine
and the per-window skew entirely via precomputed per-window tables.
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

# Lockstep-grid lane cap: window groups are sized so each grid stays at
# or under this many lanes (top of the canonical Pallas lane ladder —
# see bucket_accumulate). Module-level so tests can shrink it to drive
# the multi-group path at toy sizes.
_GROUP_LANES = 8192


def _env_pow2(name: str, default: int, lo: int, hi: int) -> int:
    """Read a power-of-2 tuning knob ONCE at import (jitted steps are
    cached, so a post-trace change could never take effect anyway —
    reading at import makes that explicit). Invalid values round up to
    the next power of two and clamp to [lo, hi]."""
    import os

    try:
        v = int(os.environ.get(name, default))
    except ValueError:
        v = default
    if v <= 0:
        v = default
    if v & (v - 1):
        v = 1 << v.bit_length()
    return max(lo, min(hi, v))


# Gathered point-row width in u32 words (>= 2L = 48, padded to a
# power-of-2 row): the bulk row gather is purely per-descriptor-bound on
# v5e (64 vs 128 words measured IDENTICAL at 2^20, ~40 ns/row), so the
# smallest aligned row wins on HBM footprint.
_ROW_WORDS = _env_pow2("LWKZG_MSM_ROW_WORDS", 64, 64, 512)

# Slots gathered per bulk take (lockstep overshoot is < chunk per
# group; 16 beat 32 by ~2.7% at 2^20 c=12 on v5e — less overshoot).
_CHUNK = _env_pow2("LWKZG_MSM_CHUNK", 16, 1, 1024)

# Fixed-base bulk-gather chunk, independent of the variable-base knob
# (the fixed-base grid's per-(group,bucket) loads are ~W/2^c times
# smaller than variable-base bucket loads at the 4096 protocol shape,
# so half the chunk keeps the same relative overshoot; 8 measured best
# in the round-4 fixed-base sweep).
_FB_CHUNK = _env_pow2("LWKZG_MSM_FB_CHUNK", 8, 1, 1024)


def _row_words() -> int:
    return _ROW_WORDS


def _chunk_cap() -> int:
    return _CHUNK


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


def _sort_members(digits: jnp.ndarray, n: int, digit_bits: int):
    """Stable sort of each row of `digits` -> (order int32, sorted u32).

    TPU: single-array sort of packed keys (digit << log2(n) | index) —
    measurably cheaper than argsort's (key, payload) comparator network;
    stability is inherent (ties break by index). Requires n a power of
    two and digit_bits + log2(n) <= 32. CPU keeps argsort: runtime is
    irrelevant there and the stable-argsort graph is already compiled
    and cached for the test suite.
    """
    from . import dispatch as _dispatch

    if (
        _dispatch.use_pallas()
        and n > 1
        and n & (n - 1) == 0
        and digit_bits + (n - 1).bit_length() <= 32
    ):
        shift = (n - 1).bit_length()
        key = (digits << shift) | jnp.arange(n, dtype=jnp.uint32)[None, :]
        skey = jnp.sort(key, axis=1)
        return (skey & jnp.uint32(n - 1)).astype(jnp.int32), skey >> shift
    order = jnp.argsort(digits, axis=1)
    return order, jnp.take_along_axis(digits, order, axis=1)


def num_windows(c: int, scalar_bits: int = 255) -> int:
    """Effective window count: ceil(scalar_bits / c)."""
    return (scalar_bits + c - 1) // c


def prepare_digits(
    scalars: jnp.ndarray, valid: jnp.ndarray, c: int, scalar_bits: int = 255
) -> jnp.ndarray:
    """scalars uint32[16, N] + valid bool[N] -> alias-split digits [W, N].

    Invalid points and zero digits route to bucket 0 (ignored later).

    scalar_bits: static bound on the scalars — every scalar MUST be
    < 2^scalar_bits (the caller's contract; violating it silently drops
    high windows). 255 (any Fr element) is always safe. Narrower bounds
    matter for both work and load shape: EIP-4844 rollup data is packed
    31 bytes per field element, and at scalar_bits=255 those 248-bit
    scalars give the window straddling bit 248 only 248 - c*w bits of
    entropy — at c=12 its load concentrates 16x in the low 256 of 4096
    buckets and the lockstep runs ~2x the rounds (the round-3/4 driver
    bench regression). scalar_bits=248 instead ends the window ladder
    AT the entropy boundary: one window fewer, and the alias split
    (below) flattens the top window like any other.

    Top-window alias split (any c): top digits are < 2^t (_top_bits),
    so buckets >= 2^t are free. Round-robin points across the
    2^(c - t) aliases of each bucket (merged back in bucket_reduce),
    flattening the top window's otherwise-concentrated load. This is
    what makes non-dividing window sizes (c = 10, 12, ...) viable —
    without it the top window's <= 2^t occupied buckets carry
    2^(c-t) times the mean load and dominate the lockstep rounds.
    """
    n = scalars.shape[1]
    w_eff = num_windows(c, scalar_bits)
    digits = window_digits(scalars, c)[:w_eff]  # [W, N]
    digits = jnp.where(valid[None, :], digits, 0)
    t_bits = _top_bits(c, scalar_bits)
    aliases = 1 << (c - t_bits)
    if aliases == 1:  # c divides scalar_bits: no free alias space
        return digits
    alias = (jnp.arange(n, dtype=jnp.uint32) & jnp.uint32(aliases - 1)) * (
        jnp.uint32(1 << t_bits)
    )
    top = digits[-1]
    return digits.at[-1].set(jnp.where(top != 0, top + alias, 0))


def _auto_split_parts(n: int, c: int) -> int:
    """Smallest power-of-2 part count restoring the packed-key sort.

    The single-array sort needs c + log2(n) <= 32 (see _sort_members);
    at n = 2^21, c = 12 that is 33 bits and round 4 fell back to the
    ~2x-costlier argsort tier (472k vs 518k pts/s at the neighbouring
    2^20). Splitting the MSM into parts of n/parts points keeps the
    packed sort in every part; the parts' bucket grids lane-add into
    one grid for the ordinary reduce. Extra cost is only skew: each
    part's lockstep runs to its OWN max bucket load (mean load per
    part shrinks by `parts`, max/mean grows slightly)."""
    if n < 2 or n & (n - 1):
        return 1
    parts = 1
    while (
        c + (n // parts - 1).bit_length() > 32 and n // parts >= 2
    ):
        parts *= 2
    return parts


def bucket_accumulate(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    scalars: jnp.ndarray,
    c: int,
    sync_axis: str | None = None,
    scalar_bits: int = 255,
    parts: int | None = None,
) -> jnp.ndarray:
    """Accumulate points into Pippenger buckets.

    points:  uint32[2, L, N] affine Montgomery
    valid:   bool[N] (False = infinity / padding)
    scalars: uint32[16, N] plain Fr limbs, < 2^scalar_bits each
    parts:   split the point set into this many equal slices, bucket-
             accumulate each, and lane-add the grids (None = auto: 1 on
             CPU / under sync_axis; on TPU the smallest power of two
             that keeps the packed-key sort — see _auto_split_parts).
    returns: uint32[3, L, M] Jacobian bucket sums, M = W * 2^c laid out
             m = w * 2^c + b (bucket 0 of each window is junk).
    """
    n = points.shape[-1]
    if parts is None:
        from . import dispatch as _dispatch

        parts = (
            _auto_split_parts(n, c)
            if sync_axis is None and _dispatch.use_pallas()
            else 1
        )
    if parts > 1 and n % parts == 0 and n // parts >= 1:
        h = n // parts
        out = None
        for p in range(parts):
            sl = slice(p * h, (p + 1) * h)
            grid = bucket_accumulate_digits(
                points[..., sl],
                prepare_digits(
                    scalars[..., sl], valid[sl], c, scalar_bits
                ),
                c,
            )
            out = grid if out is None else _add(out, grid)
        return out
    return bucket_accumulate_digits(
        points,
        prepare_digits(scalars, valid, c, scalar_bits),
        c,
        sync_axis=sync_axis,
    )


def bucket_accumulate_digits(
    points: jnp.ndarray,
    digits: jnp.ndarray,
    c: int,
    sync_axis: str | None = None,
) -> jnp.ndarray:
    """bucket_accumulate from prepared digits [W', N] (any window count —
    the window-sharded multi-chip path feeds each device its own window
    slice of prepare_digits' output; see parallel/msm.py).

    sync_axis: mesh axis name to pmax the lockstep trip counts over, so
    every shard runs the SAME number of rounds (one scalar collective).
    A collective step completes at the slowest shard anyway, and
    divergent while_loop trip counts deadlock the XLA CPU in-process
    all_gather rendezvous (40 s termination timeout) on the
    serial-emulation test mesh. Extra rounds are dead-lane madds."""
    n = points.shape[-1]
    num_buckets = 1 << c
    num_windows = digits.shape[0]

    order, sorted_digits = _sort_members(digits, n, c)

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
    if sync_axis is not None:
        max_load = jax.lax.pmax(max_load, sync_axis)

    m_total = num_windows * num_buckets
    buckets0 = g1.infinity_like((), m_total)
    live_bucket = (bucket_ids != 0)[None, :]  # [1, 2^c]

    # Point-major copy, rows padded to a power-of-2 width (_row_words):
    # the bulk row gather is per-descriptor-bound (~40 ns/row on v5e,
    # width-independent from 256 B up), so pad to the smallest aligned
    # row rather than anything wider.
    l = points.shape[1]
    rowm = jnp.transpose(points, (2, 0, 1)).reshape(n, 2 * l)  # [N, 2L]
    rw = max(_row_words(), 2 * l)
    points_rowmajor = jnp.pad(rowm, ((0, 0), (0, rw - 2 * l)))

    # Chunked accumulation (TPU): gather CHUNK slots for every bucket
    # lane in ONE bulk take per outer round (bulk takes amortize XLA's
    # per-row gather overhead; the old per-madd gather serialized one
    # small take per loop iteration and cost as much as the madd at
    # 2^20), then run CHUNK contiguous-slice madds. Rounds overshoot
    # max_load by < CHUNK slots (dead lanes masked) — negligible beyond
    # toy sizes.
    from . import dispatch as _dispatch

    if not _dispatch.use_pallas():
        # CPU (tests): the chunked-bulk-gather body below makes the XLA
        # CPU compile pathological (>1 h at the 4096 shape); the simple
        # per-iteration gather compiles in minutes and CPU runtime is
        # irrelevant. Results are bit-identical.
        points_rm = jnp.transpose(points, (2, 0, 1))  # [N, 2, L]

        def body_s(carry):
            t, buckets = carry
            idx = starts + t  # [W, 2^c]
            live = jnp.logical_and(idx < ends, live_bucket)
            idx_c = jnp.minimum(idx, n - 1)
            pt_idx = jnp.take_along_axis(order, idx_c, axis=1)
            rows = jnp.take(points_rm, pt_idx.reshape(-1), axis=0)
            gathered = jnp.transpose(rows, (1, 2, 0))  # [2, L, M]
            return (t + 1, _madd(buckets, gathered, live.reshape(-1)))

        _, buckets = jax.lax.while_loop(
            lambda c_: c_[0] < max_load, body_s, (jnp.int32(0), buckets0)
        )
        return buckets

    chunk = max(1, min(_chunk_cap(), n))
    order_flat = order.reshape(-1)  # [W*N]

    # Window-grouped lockstep: cap each grid at <= 8192 lanes (the top
    # of the canonical Pallas lane ladder — ops/dispatch.py pads lane
    # counts to powers of two, so an uncapped W * 2^c grid would run
    # with up to ~1.45x dead pad lanes at e.g. c = 12). Groups run as a
    # lax.scan; each group's lockstep advances only to ITS max bucket
    # load, so per-group skew replaces global skew.
    gsz = min(num_windows, max(1, _GROUP_LANES // num_buckets))
    n_groups = -(-num_windows // gsz)
    w_pad = n_groups * gsz - num_windows

    if n_groups == 1:
        w_off = (jnp.arange(num_windows, dtype=jnp.int32) * n)[:, None]

        def body(carry):
            base, buckets = carry
            t_off = base + jnp.arange(chunk, dtype=jnp.int32)[:, None, None]
            idx = starts[None] + t_off  # [chunk, W, 2^c]
            live = jnp.logical_and(idx < ends[None], live_bucket[None])
            idx_c = jnp.minimum(idx, n - 1)
            flat = (w_off[None] + idx_c).reshape(-1)
            pt_idx = jnp.take(order_flat, flat)  # [chunk*W*2^c]
            rows = jnp.take(points_rowmajor, pt_idx, axis=0)  # [*, 128]
            gathered = jnp.transpose(
                rows[:, : 2 * l].reshape(chunk, m_total, 2, l), (0, 2, 3, 1)
            )  # [chunk, 2, L, M]
            live_flat = live.reshape(chunk, m_total)

            def inner(t, b):
                g = jax.lax.dynamic_index_in_dim(gathered, t, 0, keepdims=False)
                lv = jax.lax.dynamic_index_in_dim(live_flat, t, 0, keepdims=False)
                return _madd(b, g, lv)

            buckets = jax.lax.fori_loop(0, chunk, inner, buckets)
            return (base + chunk, buckets)

        def cond(carry):
            base, _ = carry
            return base < max_load

        _, buckets = jax.lax.while_loop(cond, body, (jnp.int32(0), buckets0))
        return buckets

    m_g = gsz * num_buckets
    if w_pad:  # empty pad windows: zero counts, loops skip them
        pad_se = jnp.full((w_pad, num_buckets), n, dtype=jnp.int32)
        starts = jnp.concatenate([starts, pad_se])
        ends = jnp.concatenate([ends, pad_se])
        counts = jnp.concatenate(
            [counts, jnp.zeros((w_pad, num_buckets), dtype=counts.dtype)]
        )
    starts_r = starts.reshape(n_groups, gsz, num_buckets)
    ends_r = ends.reshape(n_groups, gsz, num_buckets)
    maxl_r = jnp.max(
        counts.reshape(n_groups, gsz, num_buckets)[..., 1:], axis=(1, 2)
    )
    if sync_axis is not None:
        maxl_r = jax.lax.pmax(maxl_r, sync_axis)
    woff_r = (
        jnp.arange(n_groups * gsz, dtype=jnp.int32) * n
    ).reshape(n_groups, gsz, 1)

    def group_fn(_, gd):
        starts_g, ends_g, maxl_g, woff_g = gd

        def body(carry):
            base, buckets = carry
            t_off = base + jnp.arange(chunk, dtype=jnp.int32)[:, None, None]
            idx = starts_g[None] + t_off  # [chunk, gsz, 2^c]
            live = jnp.logical_and(idx < ends_g[None], live_bucket[None])
            idx_c = jnp.minimum(idx, n - 1)
            flat = (woff_g[None] + idx_c).reshape(-1)
            pt_idx = jnp.take(order_flat, flat)  # clips pad-window reads
            rows = jnp.take(points_rowmajor, pt_idx, axis=0)
            gathered = jnp.transpose(
                rows[:, : 2 * l].reshape(chunk, m_g, 2, l), (0, 2, 3, 1)
            )
            live_flat = live.reshape(chunk, m_g)

            def inner(t, b):
                g = jax.lax.dynamic_index_in_dim(gathered, t, 0, keepdims=False)
                lv = jax.lax.dynamic_index_in_dim(live_flat, t, 0, keepdims=False)
                return _madd(b, g, lv)

            return (base + chunk, jax.lax.fori_loop(0, chunk, inner, buckets))

        _, buckets = jax.lax.while_loop(
            lambda cr: cr[0] < maxl_g,
            body,
            (jnp.int32(0), g1.infinity_like((), m_g)),
        )
        return None, buckets

    _, groups_out = jax.lax.scan(
        group_fn, None, (starts_r, ends_r, maxl_r, woff_r)
    )  # [n_groups, 3, L, m_g]
    buckets = jnp.transpose(groups_out, (1, 2, 0, 3)).reshape(
        3, l, n_groups * m_g
    )
    return buckets[..., :m_total]


def _tree_sum_lanes(arr4: jnp.ndarray) -> jnp.ndarray:
    """Pairwise point-sum over the last (bucket) axis of [3, L, W, k].

    k must be a power of two. Shape-INVARIANT: every round is a masked
    roll-add on the same flat [3, L, W*k] array, so all rounds share one
    compiled kernel shape (each distinct Pallas lane shape costs ~45 s of
    Mosaic compile — see ops/dispatch.py)."""
    from . import dispatch

    w, k = arr4.shape[-2], arr4.shape[-1]
    assert k & (k - 1) == 0, "tree width must be a power of two"
    if dispatch.use_pallas():
        # pairwise halving: ~W*k lane-adds total; shrinking shapes land
        # on the canonical {512..8192} Pallas ladder (ops/dispatch.py)
        while arr4.shape[-1] > 1:
            half = arr4.shape[-1] // 2
            lo = _flat(arr4[..., :half])
            hi = _flat(arr4[..., half : 2 * half])
            arr4 = _add(lo, hi).reshape(arr4.shape[:-1] + (half,))
        return arr4[..., 0]  # [3, L, W]
    # CPU: masked roll-adds at ONE fixed shape (multi-shape XLA limb
    # graphs were a >30-minute CPU compile in round 1)
    arr = _flat(arr4)
    idx = jnp.arange(w * k) % k
    while k > 1:
        half = k // 2
        rolled = jnp.roll(arr, -half, axis=-1)
        summed = _add(arr, rolled)
        arr = jnp.where((idx < half)[None, None, :], summed, arr)
        k = half
    return arr[..., :: arr4.shape[-1]]  # [3, L, W]


def _flat(arr4: jnp.ndarray) -> jnp.ndarray:
    """[3, L, W, k] -> [3, L, W*k] (contiguous lane flatten)."""
    s = arr4.shape
    return arr4.reshape(s[:-2] + (s[-2] * s[-1],))


def _top_bits(c: int, scalar_bits: int = 255) -> int:
    """Bit-width of the top window's digits: scalars are < 2^scalar_bits,
    so with W = ceil(scalar_bits/c) windows the top digit is
    < 2^(scalar_bits - c*(W-1)). When <= c, the top window's upper
    buckets are free alias space (bucket_accumulate round-robins points
    across them — the lockstep loop runs max-bucket-load rounds, and an
    unsplit top window would concentrate 2^(c - top_bits) times the
    mean load there); == c when c divides scalar_bits (no split)."""
    return scalar_bits - c * (num_windows(c, scalar_bits) - 1)


def bucket_reduce(
    buckets: jnp.ndarray,
    c: int,
    merge_top: bool = True,
    top_mask: jnp.ndarray | None = None,
    scalar_bits: int = 255,
) -> jnp.ndarray:
    """[3, L, M] buckets -> [3, L, W] window sums S_w = sum_b b*B_b.

    TPU: fold-reduce (~3*2^c adds per window; its halving shapes land on
    the canonical {512..8192} Pallas ladder, so the Mosaic compile count
    stays bounded — round 1's unbounded shapes were a 10-minute cold
    start by themselves). CPU: suffix-scan — two fori_loops whose bodies
    are masked roll-adds at ONE fixed [3, L, M] shape (XLA CPU compiles
    of many-shape limb graphs took >30 minutes); the scan's extra ~2c
    full-width adds only matter on real chips (~19 ms at M = 8192,
    ~143 ns per in-loop lane-add measured).

    top_mask: bool[W] marking which window(s) carry the alias-split top
    digits (window-sharded path: the global top window lands on an
    arbitrary shard position); None = the last window (single-chip).
    """
    arr = _zero_bucket0(buckets, c)
    if merge_top and _top_bits(c, scalar_bits) < c:
        # generic path only: bucket_accumulate alias-splits the top
        # window; the fixed-base grid has no top window (lanes are
        # groups) and must NOT be merged. No-op when c divides
        # scalar_bits (prepare_digits skipped the split).
        arr = _merge_top_aliases(arr, c, top_mask, scalar_bits)
    from . import dispatch

    if dispatch.use_pallas():
        return _bucket_reduce_fold(arr, c)
    return _bucket_reduce_scan(arr, c)


def _zero_bucket0(buckets: jnp.ndarray, c: int) -> jnp.ndarray:
    """Neutralize bucket-0 lanes (invalid points route there; weight 0)."""
    b_idx = jnp.arange(buckets.shape[-1]) % (1 << c)
    return jnp.where((b_idx == 0)[None, None, :], 0, buckets)


def _merge_top_aliases(
    arr: jnp.ndarray,
    c: int,
    top_mask: jnp.ndarray | None = None,
    scalar_bits: int = 255,
) -> jnp.ndarray:
    """Merge the top window's alias lanes back: bucket b's aliases live
    at lanes b + a * 2^t for a in [0, 2^(c-t)) (see prepare_digits).
    log2(aliases) pairwise folds, each a lane-add on the live half.

    top_mask None: the top window is the LAST window (single-chip) and
    only its lanes are folded. Otherwise: fold EVERY window and select
    merged vs original per window (the window-sharded path — one shard
    owns the global top window at an arbitrary local position; the
    extra folds are over a per-shard array 1/D the size)."""
    num_buckets = 1 << c
    w = arr.shape[-1] // num_buckets
    arr4 = arr.reshape(arr.shape[:-1] + (w, num_buckets))
    t_bits = _top_bits(c, scalar_bits)
    if top_mask is None:
        live = arr4[..., -1:, :]
        for _ in range(c - t_bits):
            half = live.shape[-1] // 2
            lo = live[..., :half]
            hi = live[..., half:]
            live = _add(_flat(lo), _flat(hi)).reshape(lo.shape)
        top = jnp.concatenate(
            [
                live,
                jnp.zeros(
                    live.shape[:-1] + (num_buckets - live.shape[-1],),
                    live.dtype,
                ),
            ],
            axis=-1,
        )
        arr4 = jnp.concatenate([arr4[..., :-1, :], top], axis=-2)
        return arr4.reshape(arr.shape)

    merged = arr4
    for _ in range(c - t_bits):
        half = merged.shape[-1] // 2
        lo = merged[..., :half]
        hi = merged[..., half:]
        merged = _add(_flat(lo), _flat(hi)).reshape(lo.shape)
    merged = jnp.concatenate(
        [
            merged,
            jnp.zeros(
                merged.shape[:-1] + (num_buckets - merged.shape[-1],),
                merged.dtype,
            ),
        ],
        axis=-1,
    )
    sel = top_mask[None, None, :, None]
    return jnp.where(sel, merged, arr4).reshape(arr.shape)


def _bucket_reduce_fold(arr: jnp.ndarray, c: int) -> jnp.ndarray:
    """Fold-reduce (TPU): splitting the buckets at h = 2^(c-1) gives
      sum_b b*B_b = sum_{j<h} j*(B_j + B_{j+h}) + h * sum_{j<h} B_{j+h},
    so each round folds the bucket axis in half (h/2 point adds per
    window) and banks the high-half total E_r; the answer is the Horner
    combine sum_r 2^(c-r) * E_r. ~3 ms vs the scan's ~19 ms at M = 8192.
    """
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


@functools.partial(jax.jit, static_argnames=("c", "scalar_bits"))
def msm_device(points, valid, scalars, c: int = 8, scalar_bits: int = 255):
    """Full single-chip MSM kernel: returns window sums [3, L, W].

    scalar_bits: static scalar bound (see prepare_digits) — pass 248 for
    31-byte-packed rollup blob data (one window fewer AND no mid-ladder
    entropy cliff; ~25% faster at 2^20 c=12 than treating the same
    scalars as 255-bit)."""
    return bucket_reduce(
        bucket_accumulate(points, valid, scalars, c, scalar_bits=scalar_bits),
        c,
        scalar_bits=scalar_bits,
    )


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


def msm(points, valid, scalars, c: int = 8, scalar_bits: int = 255):
    """Single-chip MSM -> host Jacobian point."""
    return combine_windows_host(
        msm_device(points, valid, scalars, c, scalar_bits), c
    )


def scalars_to_device(scalar_ints) -> jnp.ndarray:
    """Host list of ints (mod r) -> uint32[16, N] plain limb array."""
    return jnp.asarray(
        lb.ints_to_limbs([s % FR.modulus for s in scalar_ints], 16)
    )


# ---------------------------------------------------------------------------
# Fixed-base MSM: precomputed per-window point tables for the SRS
# ---------------------------------------------------------------------------
# The commitment basis is FIXED for the life of a trusted setup, so the
# per-window shifts [2^(c*w)]P_i can be precomputed once. The MSM then
# collapses to a SINGLE window: the W*N (digit, shifted-point) pairs all
# feed one 2^c-bucket grid (split across G lane groups for VPU
# occupancy), which
#   * removes the sequential c-doubling Horner combine entirely
#     (sum_b b*(sum_g B_{g,b}) needs no window weighting), and
#   * replaces per-window bucket skew with global skew: bucket loads are
#     Binomial(W*N, 2^-c), so max/mean ~ 1.1 instead of ~2 at 2^12.
# ~1.6x less lockstep madd work than the generic kernel at the 4096
# protocol shape, measured on chip. Tables: W*N affine points (25 MB at
# c=8) built on device once and disk-cached next to the SRS cache.


@functools.partial(jax.jit, static_argnames=("c",))
def build_fixedbase_tables(points, valid, c: int):
    """[2, L, N] affine + valid -> ([2, L, W*N] affine table, err bit).

    Table entry (w, i) = [2^(c*w)] P_i, affine Montgomery; invalid source
    lanes stay invalid in every window. Batch affine conversion via one
    Fermat inversion over all W*N lanes."""
    from .field_ops import FP
    from . import g1_ops as g1

    num_windows = (256 + c - 1) // c
    l = points.shape[1]
    n = points.shape[2]
    one = jnp.broadcast_to(FP.ONE_limbs, (l, n)).astype(jnp.uint32)
    z = jnp.where(valid[None, :], one, 0)
    jac = jnp.stack([points[0], points[1], z], axis=0)

    # scan over windows, fori over the c doublings: ONE dbl instance in
    # the program (unrolling W*c doublings was a compile bomb — minutes
    # of XLA/Mosaic compile for a one-time table build)
    def shift(p, _):
        p2 = jax.lax.fori_loop(0, c, lambda i, q: _dbl(q), p)
        return p2, p  # emit the state BEFORE shifting: dbl^(c*w)(jac)

    _, ys = jax.lax.scan(shift, jac, None, length=num_windows)
    all_jac = jnp.transpose(ys, (1, 2, 0, 3)).reshape(3, l, num_windows * n)

    # batch affine: x = X/Z^2, y = Y/Z^3 (Z=0 lanes -> 0/invalid)
    Z = all_jac[2]
    zinv = FP.inv(Z)
    zinv2 = FP.sqr(zinv)
    x = FP.mul(all_jac[0], zinv2)
    y = FP.mul(all_jac[1], FP.mul(zinv, zinv2))
    table = jnp.stack([x, y], axis=0)
    table_valid = jnp.tile(valid, (num_windows,))
    return table, table_valid


def fixedbase_digits(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """[16, N] plain scalars -> flat digits [W*N] (member (w, i) at
    w*N + i, matching build_fixedbase_tables' layout)."""
    return window_digits(scalars, c).reshape(-1)


@functools.partial(jax.jit, static_argnames=("c", "groups"))
def msm_fixedbase_device(table, table_valid, scalars, c: int = 8,
                         groups: int = 8):
    """Fixed-base MSM -> ONE Jacobian point [3, L, 1] (device).

    Accumulation: members sorted by digit globally; bucket b's run is
    dealt round-robin to `groups` lane groups (lane (g, b), stride G),
    so every group-bucket's load is ceil(k_b / G) — near-uniform. The
    existing bucket_reduce then treats groups as windows, and the group
    sums S_g simply add up (no Horner: window weights are baked into the
    table)."""
    from . import dispatch

    n_members = table.shape[-1]
    num_buckets = 1 << c
    digits = fixedbase_digits(scalars, c)
    digits = jnp.where(table_valid, digits, 0)

    order, sorted_digits = (
        a[0] for a in _sort_members(digits[None, :], n_members, c)
    )
    bucket_ids = jnp.arange(num_buckets, dtype=sorted_digits.dtype)
    bstart = jnp.searchsorted(sorted_digits, bucket_ids, side="left").astype(
        jnp.int32
    )
    bend = jnp.concatenate(
        [bstart[1:], jnp.asarray([n_members], dtype=jnp.int32)]
    )

    g_idx = jnp.arange(groups, dtype=jnp.int32)[:, None]  # [G, 1]
    starts = bstart[None, :] + g_idx          # [G, 2^c]
    ends = bend[None, :]                      # [1, 2^c] broadcasts
    counts = jnp.maximum(0, bend - bstart)
    max_load = (jnp.max(counts[1:]) + groups - 1) // groups

    m_total = groups * num_buckets
    buckets0 = g1.infinity_like((), m_total)
    live_bucket = (bucket_ids != 0)[None, :]
    l = table.shape[1]
    # power-of-2 padded rows: see bucket_accumulate on gather row size
    rowm = jnp.transpose(table, (2, 0, 1)).reshape(n_members, 2 * l)
    rw = max(_row_words(), 2 * l)
    points_rowmajor = jnp.pad(rowm, ((0, 0), (0, rw - 2 * l)))
    from . import dispatch as _dispatch

    if not _dispatch.use_pallas():
        # CPU (tests): per-iteration gather — see bucket_accumulate on
        # the XLA CPU compile pathology of the chunked body
        points_rm = jnp.transpose(table, (2, 0, 1))  # [W*N, 2, L]

        def body_s(carry):
            t, buckets = carry
            idx = starts + t * groups  # [G, 2^c]
            live = jnp.logical_and(idx < ends, live_bucket)
            idx_c = jnp.minimum(idx, n_members - 1)
            pt_idx = jnp.take(order, idx_c.reshape(-1))
            rows = jnp.take(points_rm, pt_idx, axis=0)
            gathered = jnp.transpose(rows, (1, 2, 0))  # [2, L, M]
            return (t + 1, _madd(buckets, gathered, live.reshape(-1)))

        _, buckets = jax.lax.while_loop(
            lambda c_: c_[0] < max_load, body_s, (jnp.int32(0), buckets0)
        )
        group_sums = bucket_reduce(buckets, c, merge_top=False)
        return _tree_sum_lanes(
            group_sums.reshape(group_sums.shape[:-1] + (1, groups))
        )

    chunk = max(1, min(_FB_CHUNK, (n_members + groups - 1) // groups))

    def body(carry):
        base, buckets = carry
        t_off = (base + jnp.arange(chunk, dtype=jnp.int32))[:, None, None]
        idx = starts[None] + t_off * groups  # [chunk, G, 2^c]
        live = jnp.logical_and(idx < ends[None], live_bucket[None])
        idx_c = jnp.minimum(idx, n_members - 1)
        pt_idx = jnp.take(order, idx_c.reshape(-1))
        rows = jnp.take(points_rowmajor, pt_idx, axis=0)
        gathered = jnp.transpose(
            rows[:, : 2 * l].reshape(chunk, m_total, 2, l), (0, 2, 3, 1)
        )
        live_flat = live.reshape(chunk, m_total)

        def inner(t, b):
            g = jax.lax.dynamic_index_in_dim(gathered, t, 0, keepdims=False)
            lv = jax.lax.dynamic_index_in_dim(live_flat, t, 0, keepdims=False)
            return _madd(b, g, lv)

        return (base + chunk, jax.lax.fori_loop(0, chunk, inner, buckets))

    def cond(carry):
        base, _ = carry
        return base < max_load

    _, buckets = jax.lax.while_loop(cond, body, (jnp.int32(0), buckets0))

    group_sums = bucket_reduce(buckets, c, merge_top=False)  # [3, L, G]
    # no Horner: just sum the groups (pairwise tree on the lane axis)
    return _tree_sum_lanes(
        group_sums.reshape(group_sums.shape[:-1] + (1, groups))
    )  # [3, L, 1]


def msm_fixedbase(table, table_valid, scalars, c: int = 8, groups: int = 8):
    """Fixed-base MSM -> host Jacobian point (Python ints)."""
    pt = np.asarray(msm_fixedbase_device(table, table_valid, scalars, c, groups))
    return g1.points_to_host(pt)[0]
