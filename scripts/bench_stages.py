"""Stage-split timing of the generic MSM kernel on the real chip.

Splits msm_device at 2^20 into: digit+sort+offsets / accumulate
(gather+madd lockstep) / bucket reduce, by timing jitted prefixes of the
pipeline (XLA compiles each prefix separately; subtraction gives the
stage cost). Drives the round-3 optimization priorities (VERDICT #2).

Usage: python scripts/bench_stages.py [--n 1048576] [--c 12]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, iters=3):
    jax.block_until_ready(fn())  # compile
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--c", type=int, default=12)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import lambdaworks_kzg_tpu  # noqa: F401  (compile cache config)
    from lambdaworks_kzg_tpu.ops import msm as M

    n, c = args.n, args.c
    print(f"backend={jax.default_backend()} n=2^{n.bit_length()-1} c={c}",
          file=sys.stderr)
    rng = np.random.default_rng(0)
    points = jnp.asarray(
        rng.integers(0, 2**16, (2, 24, n), dtype=np.uint32))
    valid = jnp.ones((n,), dtype=bool)
    # Scalars MUST be < 2^255 (Fr range): the top-window alias split
    # assumes top digits < 2^(255 - c*(W-1)); full-width random limbs
    # overload the last bucket ~1000x and trip the device watchdog.
    sc = rng.integers(0, 2**16, (16, n), dtype=np.uint32)
    sc[15] &= 0x7FFF
    scalars = jnp.asarray(sc)

    @functools.partial(jax.jit, static_argnames=("cc",))
    def stage_sort(sc, cc):
        digits = M.window_digits(sc, cc)
        order, sorted_digits = M._sort_members(digits, n, cc)
        bucket_ids = jnp.arange(1 << cc, dtype=sorted_digits.dtype)
        starts = jax.vmap(
            lambda sd: jnp.searchsorted(sd, bucket_ids, side="left")
        )(sorted_digits).astype(jnp.int32)
        return order, starts

    @functools.partial(jax.jit, static_argnames=("cc",))
    def stage_acc(pts, v, sc, cc):
        return M.bucket_accumulate(pts, v, sc, cc)

    @functools.partial(jax.jit, static_argnames=("cc",))
    def stage_full(pts, v, sc, cc):
        return M.bucket_reduce(M.bucket_accumulate(pts, v, sc, cc), cc)

    t_sort = timeit(lambda: stage_sort(scalars, c), args.iters)
    print(f"sort+offsets: {t_sort*1e3:.0f} ms")
    t_acc = timeit(lambda: stage_acc(points, valid, scalars, c), args.iters)
    print(f"accumulate (incl sort): {t_acc*1e3:.0f} ms "
          f"-> lockstep {1e3*(t_acc-t_sort):.0f} ms")
    t_full = timeit(lambda: stage_full(points, valid, scalars, c), args.iters)
    print(f"full msm_device: {t_full*1e3:.0f} ms "
          f"-> reduce {1e3*(t_full-t_acc):.0f} ms")
    print(f"pts/s: {n/t_full:.0f}")


if __name__ == "__main__":
    main()
