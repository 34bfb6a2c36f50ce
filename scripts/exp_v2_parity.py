"""v2 Pallas kernel parity vs the XLA tier, on the real chip + timing.

Checks madd/add/dbl bit-equality on real curve points including the
exceptional lanes (infinity buckets, P==Q doubling, P==-Q cancellation,
dead lanes), then times the in-loop madd of v1 vs v2.
"""

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
    from lambdaworks_kzg_tpu.models import srs
    from lambdaworks_kzg_tpu.ops import g1_ops as g1
    from lambdaworks_kzg_tpu.ops import pallas_g1 as v1
    from lambdaworks_kzg_tpu.ops import pallas_g1_v2 as v2
    from lambdaworks_kzg_tpu.ops.field_ops import FP

    M = 512
    setup = srs.create_dev_setup(64, secret=0xABC)
    pts, valid = g1.make_points_host(setup.g1_lagrange_brp)  # [2, L, 64]
    reps = M // 64
    q_aff = jnp.tile(pts, (1, 1, reps))
    q_valid = jnp.tile(valid, (reps,))

    L = FP.L
    one = jnp.broadcast_to(FP.ONE_limbs, (L, M)).astype(jnp.uint32)
    # p = lift(q rolled by 1): generic adds
    q_roll = jnp.roll(q_aff, 7, axis=-1)
    p = jnp.concatenate([q_roll, one[None]], axis=0)
    # exceptional lanes:
    #   lane 0: p = infinity (Z=0)
    p = p.at[:, :, 0].set(0)
    #   lane 1: p == q (doubling)
    p = p.at[0, :, 1].set(q_aff[0, :, 1])
    p = p.at[1, :, 1].set(q_aff[1, :, 1])
    p = p.at[2, :, 1].set(one[:, 1])
    #   lane 2: p == -q (cancellation -> infinity)
    negy = FP.sub(jnp.zeros((L, M), jnp.uint32), q_aff[1])
    p = p.at[0, :, 2].set(q_aff[0, :, 2])
    p = p.at[1, :, 2].set(negy[:, 2])
    p = p.at[2, :, 2].set(one[:, 2])
    #   lane 3: dead q lane
    q_valid = q_valid.at[3].set(False)

    ref_madd = np.asarray(g1.madd(p, q_aff, q_valid))
    got = np.asarray(v2.madd(p, q_aff, q_valid))
    assert np.array_equal(ref_madd, got), "madd mismatch"
    print("madd parity OK")

    q_jac = jnp.concatenate([q_aff, jnp.where(q_valid[None, None],
                                              one[None], 0)], axis=0)
    ref_add = np.asarray(g1.add(p, q_jac))
    got = np.asarray(v2.add(p, q_jac))
    assert np.array_equal(ref_add, got), "add mismatch"
    print("add parity OK")

    ref_dbl = np.asarray(g1.dbl(p))
    got = np.asarray(v2.dbl(p))
    assert np.array_equal(ref_dbl, got), "dbl mismatch"
    print("dbl parity OK")

    # ---- timing at 8192 lanes, in-loop ----
    M2 = 8192
    rng = np.random.default_rng(0)
    pb = jnp.asarray(rng.integers(0, 2**16, (3, L, M2), dtype=np.uint32))
    qb = jnp.asarray(rng.integers(0, 2**16, (2, L, M2), dtype=np.uint32))
    lv = jnp.ones((M2,), dtype=bool)
    ROUNDS = 128

    for name, mod in (("v1", v1), ("v2", v2)):
        @jax.jit
        def loop(pb, qb, lv, mod=mod):
            def body(i, acc):
                return mod.madd(acc, qb, lv)
            return jax.lax.fori_loop(0, ROUNDS, body, pb)
        t0 = time.perf_counter()
        t = timeit(lambda: loop(pb, qb, lv))
        print(f"{name} madd in-loop: {t*1e9/(ROUNDS*M2):.1f} ns/lane "
              f"(compile+3 iters took {time.perf_counter()-t0:.0f}s)")


if __name__ == "__main__":
    main()
