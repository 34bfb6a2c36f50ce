"""Generic-MSM size sweep on the chip (SURVEY §6: sharded MSM sweep
2^16-2^22; this is the single-chip axis).

Points are tiled ON DEVICE from a 4096-point seed (pushing 2^22 raw
points through the dev tunnel costs ~800 MB; the tile is free on HBM).
Scalars are uniform 255-bit.

    python scripts/bench_msm_sweep.py [--sizes 16,18,20,21,22] [--c 12]
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
    ap.add_argument("--sizes", default="16,18,20,21,22")
    ap.add_argument("--c", type=int, default=12)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    import lambdaworks_kzg_tpu  # noqa: F401  (compile cache config)
    from lambdaworks_kzg_tpu.ops import msm as M

    c = args.c
    print(f"backend={jax.default_backend()} c={c}", flush=True)
    rng = np.random.default_rng(0)
    seed_pts = jnp.asarray(
        rng.integers(0, 2**16, (2, 24, 4096), dtype=np.uint32)
    )

    for lg in (int(x) for x in args.sizes.split(",")):
        n = 1 << lg
        reps = max(1, n // 4096)
        pts = jnp.tile(seed_pts, (1, 1, reps))[..., :n]
        valid = jnp.ones((n,), dtype=bool)
        sc = rng.integers(0, 2**16, (16, n), dtype=np.uint32)
        sc[15] &= 0x7FFF
        scalars = jnp.asarray(sc)
        fn = lambda: jax.block_until_ready(
            M.msm_device(pts, valid, scalars, c)
        )
        try:
            t0 = time.perf_counter()
            fn()
            print(f"2^{lg}: first call {time.perf_counter()-t0:.1f}s",
                  flush=True)
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            print(f"2^{lg}: {best*1e3:8.1f} ms  {n/best/1e3:7.0f}k pts/s",
                  flush=True)
        except Exception as e:
            print(f"2^{lg}: skipped ({type(e).__name__}: {e})", flush=True)


if __name__ == "__main__":
    main()
