"""Probe: XLA bulk row-gather cost vs row width on the real chip.

The MSM lockstep loop is gather-bound (~60% at c=12); rows are padded
to 128 u32 words because round-2 measured 40 ns/row at 512 B vs 81 ns
at 192 B. 192 B is neither burst- nor power-of-2-aligned — this probes
the full ladder (48/64/96/128/256 words) to find the true optimum.

Usage: python scripts/exp_gather_rows.py [--n 1048576] [--rows 262144]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--rows", type=int, default=1 << 18)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import lambdaworks_kzg_tpu  # noqa: F401 (compile cache config)

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        rng.integers(0, args.n, (args.rows,), dtype=np.int32)
    )

    take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    for words in (48, 64, 96, 128, 256):
        table = jnp.asarray(
            rng.integers(0, 2**16, (args.n, words), dtype=np.uint32)
        )
        jax.block_until_ready(take(table, idx))
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            jax.block_until_ready(take(table, idx))
            best = min(best, time.perf_counter() - t0)
        ns = best / args.rows * 1e9
        gbs = args.rows * words * 4 / best / 1e9
        print(f"{words:4d} words ({words*4:4d} B): {ns:6.1f} ns/row "
              f"({gbs:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
