"""Microbenchmarks that drive the MSM kernel design (run on the real chip).

Measures, at 2^20 points:
  * bulk row gather (point-major [N, 2, L] rows by random index) — the
    candidate replacement for the per-iteration in-loop gather
  * in-loop serial gather (what bucket_accumulate does today)
  * argsort cost for the window digit sort
  * in-loop madd throughput (the accumulate floor)
Prints one line per metric.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, iters=3):
    fn()  # compile
    jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    import lambdaworks_kzg_tpu  # configure compile cache  # noqa: F401
    from lambdaworks_kzg_tpu.ops import pallas_g1
    from lambdaworks_kzg_tpu.ops.dispatch import use_pallas

    N = 1 << 20
    L = 24
    rng = np.random.default_rng(0)
    # point-major rows [N, 2, L] (192 B per row)
    rows = jnp.asarray(rng.integers(0, 2**16, (N, 2, L), dtype=np.uint32))
    idx = jnp.asarray(rng.permutation(N).astype(np.int32))

    # 1. bulk gather of all N rows at once
    f_bulk = jax.jit(lambda: jnp.take(rows, idx, axis=0))
    t = timeit(f_bulk)
    print(f"bulk_take_rows: {t*1e9/N:.1f} ns/row ({N*192/t/1e9:.1f} GB/s)")

    # 1b. bulk gather in 8 chunks (the chunked-accumulate shape)
    k = N // 8
    f_chunk = jax.jit(
        lambda: [jnp.take(rows, idx[i * k : (i + 1) * k], axis=0) for i in range(8)]
    )
    t = timeit(f_chunk)
    print(f"chunked_take_rows: {t*1e9/N:.1f} ns/row")

    # 2. serial in-loop gather (8192 rows/iter, 128 iters — today's shape)
    M = 8192
    iters = N // M

    def serial():
        def body(i, acc):
            sl = jax.lax.dynamic_slice_in_dim(idx, i * M, M)
            g = jnp.take(rows, sl, axis=0)
            return acc + g[0, 0, 0].astype(jnp.uint32)

        return jax.lax.fori_loop(0, iters, body, jnp.uint32(0))

    t = timeit(jax.jit(serial))
    print(f"serial_take_rows: {t*1e9/N:.1f} ns/row")

    # 3. argsort [32, N] u32 (the per-window digit sort)
    digits = jnp.asarray(rng.integers(0, 256, (32, N), dtype=np.uint32))
    f_sort = jax.jit(lambda: jnp.argsort(digits, axis=1))
    t = timeit(f_sort)
    print(f"argsort_32xN: {t*1e3:.1f} ms ({t*1e9/(32*N):.1f} ns/elem)")

    # 3b. sort u32 keys only (no argsort payload)
    f_sortk = jax.jit(lambda: jnp.sort(digits, axis=1))
    t = timeit(f_sortk)
    print(f"sort_32xN: {t*1e3:.1f} ms")

    # 4. in-loop madd floor (8192 lanes)
    if use_pallas():
        p = jnp.asarray(rng.integers(0, 2**16, (3, L, M), dtype=np.uint32))
        q = jnp.asarray(rng.integers(0, 2**16, (2, L, M), dtype=np.uint32))
        live = jnp.ones((M,), dtype=bool)

        def loop_madd():
            def body(i, acc):
                return pallas_g1.madd(acc, q, live)

            return jax.lax.fori_loop(0, 128, body, p)

        t = timeit(jax.jit(loop_madd))
        print(f"madd_inloop: {t*1e9/(128*M):.1f} ns/lane")

    # 5. transpose [N,2,L] -> [2,L,N] (layout change cost)
    f_tr = jax.jit(lambda: jnp.transpose(rows, (1, 2, 0)) + jnp.uint32(1))
    t = timeit(f_tr)
    print(f"transpose_rows: {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
