"""Experiment: MSM pipeline-stage alternatives on the real chip.

Measures, at the 2^20 generic-MSM shape (c = 8 baseline):
  1. argsort [W, N] u32            (round-2 baseline: ~1.3 s)
  2. packed-key jnp.sort [W, N]    (digit*N + i in one u32; c + 20 <= 32)
  3. counting-rank + u32 scatter   (hierarchical one-hot cumsum ranks)
  4. gather chunk-size sweep on the bulk take

Usage: python scripts/exp_msm_sort.py [--n 20] [--c 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--c", type=int, default=8)
    args = ap.parse_args()
    n = 1 << args.n
    c = args.c
    w = (256 + c - 1) // c
    rng = np.random.default_rng(0)
    digits = jnp.asarray(
        rng.integers(0, 1 << c, size=(w, n), dtype=np.uint32)
    )

    # 1. baseline argsort
    f1 = jax.jit(lambda d: jnp.argsort(d, axis=1))
    t, order1 = timeit(f1, digits)
    print(f"argsort [{w},{n}]: {t*1e3:.1f} ms")

    # 2. packed-key sort (requires c + log2(n) <= 32)
    if c + args.n <= 32:

        def packed(d):
            key = (d << args.n) | jnp.arange(
                n, dtype=jnp.uint32
            )[None, :]
            s = jnp.sort(key, axis=1)
            return (s & jnp.uint32(n - 1)), (s >> args.n)

        f2 = jax.jit(packed)
        t, (order2, sd2) = timeit(f2, digits)
        print(f"packed-key sort: {t*1e3:.1f} ms")
        ok = bool(
            jnp.all(
                jnp.take_along_axis(digits, order2.astype(jnp.int32), axis=1)
                == sd2
            )
        )
        print(f"  correct: {ok}")

    # 3. counting-rank + scatter
    #    rank[i] = excl_hist[digit[i]] + (# of j < i with same digit)
    #    via chunked one-hot cumsum (chunk S small enough for u16)
    S = 512

    def rank_scatter(d):
        nb = 1 << c
        ids = jnp.arange(nb, dtype=jnp.uint32)
        dc = d.reshape(w, n // S, S)
        oh = (dc[..., None] == ids).astype(jnp.uint16)  # [W, C, S, nb]
        run = jnp.cumsum(oh, axis=2, dtype=jnp.uint16)  # inclusive
        chunk_tot = run[:, :, -1, :].astype(jnp.uint32)  # [W, C, nb]
        chunk_base = jnp.cumsum(chunk_tot, axis=1) - chunk_tot  # excl [W,C,nb]
        tot = jnp.sum(chunk_tot, axis=1)  # [W, nb]
        hist_base = jnp.cumsum(tot, axis=1) - tot  # excl hist [W, nb]
        within = (
            jnp.take_along_axis(run, dc[..., None].astype(jnp.int32), axis=3)[
                ..., 0
            ].astype(jnp.uint32)
            - 1
        )  # [W, C, S]
        cb = jnp.take_along_axis(
            chunk_base, dc.astype(jnp.int32), axis=2
        )  # [W, C, S]
        hb = jnp.take_along_axis(
            hist_base[:, None, :].repeat(n // S, axis=1),
            dc.astype(jnp.int32),
            axis=2,
        )
        rank = (hb + cb + within).reshape(w, n)  # [W, N]
        src = jnp.broadcast_to(jnp.arange(n, dtype=jnp.uint32), (w, n))
        order = jnp.zeros((w, n), dtype=jnp.uint32)
        order = jax.vmap(
            lambda o, r, s: o.at[r].set(s, unique_indices=True)
        )(order, rank, src)
        return order

    f3 = jax.jit(rank_scatter)
    t, order3 = timeit(f3, digits)
    print(f"counting-rank + scatter: {t*1e3:.1f} ms")
    sd3 = jnp.take_along_axis(digits, order3.astype(jnp.int32), axis=1)
    ok = bool(jnp.all(sd3[:, 1:] >= sd3[:, :-1]))
    print(f"  correct (sorted): {ok}")

    # 4. bulk-take chunk sweep at the real row shape
    rows = jnp.asarray(
        rng.integers(0, 2**31, size=(n, 128), dtype=np.int64).astype(
            np.uint32
        )
    )
    m = w * (1 << c)
    for chunk in (8, 16, 32, 64):
        idx = jnp.asarray(
            rng.integers(0, n, size=(chunk * m,), dtype=np.int64).astype(
                np.int32
            )
        )
        f4 = jax.jit(lambda r, i: jnp.take(r, i, axis=0))
        t, _ = timeit(f4, rows, idx)
        print(
            f"bulk take chunk={chunk} ({chunk*m} rows): {t*1e3:.1f} ms "
            f"({t/ (chunk*m) * 1e9:.1f} ns/row)"
        )


if __name__ == "__main__":
    main()
