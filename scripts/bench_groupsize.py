"""A/B the lockstep group size at 2^20 c=12 on the chip.

gsz = _GROUP_LANES // 2^c windows share one lockstep grid; each group
runs to the max bucket load over its windows. Fewer windows per group
means less skew coupling (per-window max instead of max-of-pair) but
more, smaller grids. Usage:

    python scripts/bench_groupsize.py [--lanes 8192,4096] [--c 12]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--c", type=int, default=12)
    ap.add_argument("--scalar-bits", type=int, default=255)
    ap.add_argument("--lanes", default="8192,4096")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import lambdaworks_kzg_tpu  # noqa: F401  (compile cache config)
    from lambdaworks_kzg_tpu.ops import msm as M

    n, c, sb = args.n, args.c, args.scalar_bits
    print(f"backend={jax.default_backend()} n=2^{n.bit_length()-1} c={c} "
          f"sb={sb}", file=sys.stderr)
    rng = np.random.default_rng(0)
    points = jnp.asarray(rng.integers(0, 2**16, (2, 24, n), dtype=np.uint32))
    valid = jnp.ones((n,), dtype=bool)
    sc = rng.integers(0, 2**16, (16, n), dtype=np.uint32)
    if sb >= 255:
        sc[15] &= 0x7FFF
    else:  # zero limbs/bits above sb (16-bit limbs)
        full, rem = divmod(sb, 16)
        sc[full + (1 if rem else 0):] = 0
        if rem:
            sc[full] &= (1 << rem) - 1
    scalars = jnp.asarray(sc)

    for lanes in (int(x) for x in args.lanes.split(",")):
        M._GROUP_LANES = lanes
        fn = jax.jit(
            lambda p, v, s: M.bucket_reduce(
                M.bucket_accumulate(p, v, s, c, scalar_bits=sb),
                c, scalar_bits=sb),
        )
        t0 = time.perf_counter()
        jax.block_until_ready(fn(points, valid, scalars))
        print(f"lanes={lanes}: compile+run {time.perf_counter()-t0:.1f}s")
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(points, valid, scalars))
            best = min(best, time.perf_counter() - t0)
        print(f"lanes={lanes}: {best*1e3:.0f} ms  "
              f"{n/best/1e3:.0f}k pts/s", flush=True)


if __name__ == "__main__":
    main()
