"""Sweep the v1 madd kernel lane tile: does a register-resident working
set (small TILE) beat the 512-lane tile? (Spill hypothesis: one Fp temp
at TILE=512 is 12 vregs; the madd live set is ~10 values, far over the
register file, so every op round-trips VMEM.)"""

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
    from lambdaworks_kzg_tpu.ops import pallas_g1 as v1

    L = 24
    M2 = 8192
    rng = np.random.default_rng(0)
    pb = jnp.asarray(rng.integers(0, 2**16, (3, L, M2), dtype=np.uint32))
    qb = jnp.asarray(rng.integers(0, 2**16, (2, L, M2), dtype=np.uint32))
    lv = jnp.ones((M2,), dtype=bool)
    ROUNDS = 128

    for tile in (128, 256, 512, 1024):
        v1.TILE = tile
        # bust the jit cache (TILE is read inside the traced fn)
        v1.madd._clear_cache()

        @jax.jit
        def loop(pb, qb, lv):
            def body(i, acc):
                return v1.madd(acc, qb, lv)
            return jax.lax.fori_loop(0, ROUNDS, body, pb)

        t0 = time.perf_counter()
        t = timeit(lambda: loop(pb, qb, lv))
        print(f"TILE={tile}: {t*1e9/(ROUNDS*M2):.1f} ns/lane "
              f"(total {time.perf_counter()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
