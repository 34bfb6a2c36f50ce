"""Split the MSM lockstep cost into gather vs madd on the real chip.

Replicates bucket_accumulate's TPU loop shape at 2^20/c=12 but with
(a) gather-only bodies (bulk take + u32 fold, no point math) and
(b) madd-only bodies (same madd count, fixed operand block, no gather),
so the two costs can be compared against the real combined loop.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, iters=3):
    jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import lambdaworks_kzg_tpu  # noqa: F401
    from lambdaworks_kzg_tpu.ops import msm as M
    from lambdaworks_kzg_tpu.ops.dispatch import madd as _madd

    n, c = 1 << 20, 12
    num_buckets = 1 << c
    num_windows = (256 + c - 1) // c
    gsz = max(1, M._GROUP_LANES // num_buckets)
    n_groups = -(-num_windows // gsz)
    m_g = gsz * num_buckets
    # measured on real runs: mean load 256, max/group ~ 330
    rounds = 336 // 32  # outer while rounds at chunk=32
    chunk = 32
    l = 24
    rng = np.random.default_rng(0)
    rowm = jnp.asarray(rng.integers(0, 2**16, (n, 128), dtype=np.uint32))
    order_flat = jnp.asarray(
        rng.integers(0, n, (num_windows * n,), dtype=np.int32))
    idx0 = jnp.asarray(
        rng.integers(0, num_windows * n, (chunk, m_g), dtype=np.int32))
    print(f"groups={n_groups} gsz={gsz} m_g={m_g} rounds/group={rounds}",
          file=sys.stderr)

    # (a) gather-only: same bulk-take volume as the real loop
    @jax.jit
    def gather_only(rowm, order_flat, idx0):
        def group_fn(acc, _):
            def body(i, a):
                flat = ((idx0 + i).reshape(-1) + a[0]) % (num_windows * n)
                pt_idx = jnp.take(order_flat, flat)
                rows = jnp.take(rowm, pt_idx, axis=0)
                return a + jnp.sum(rows, axis=0)  # consume every column
            return jax.lax.fori_loop(0, rounds, body, acc), None
        acc, _ = jax.lax.scan(
            group_fn, jnp.zeros((128,), jnp.uint32), None, length=n_groups)
        return acc

    t = timeit(lambda: gather_only(rowm, order_flat, idx0))
    total_rows = n_groups * rounds * chunk * m_g
    print(f"gather-only: {t*1e3:.0f} ms ({t*1e9/total_rows:.1f} ns/row, "
          f"{total_rows} rows)")

    # (b) madd-only: same madd count/shape, no gather
    buckets0 = jnp.zeros((3, l, m_g), dtype=jnp.uint32)
    gblock = jnp.asarray(
        rng.integers(0, 2**16, (2, l, m_g), dtype=np.uint32))
    live = jnp.ones((m_g,), dtype=bool)

    @jax.jit
    def madd_only(buckets0, gblock, live):
        def group_fn(b, _):
            def body(i, bb):
                return _madd(bb, gblock, live)
            b = jax.lax.fori_loop(0, rounds * chunk, body, b)
            return b, None
        out, _ = jax.lax.scan(group_fn, buckets0, None, length=n_groups)
        return out

    t = timeit(lambda: madd_only(buckets0, gblock, live))
    total_madds = n_groups * rounds * chunk
    print(f"madd-only: {t*1e3:.0f} ms ({t*1e6/total_madds:.1f} us per "
          f"{m_g}-lane madd = {t*1e9/(total_madds*m_g):.1f} ns/lane)")


if __name__ == "__main__":
    main()
