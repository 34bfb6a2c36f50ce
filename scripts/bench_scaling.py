"""Sharded-MSM scaling proxy on the virtual CPU mesh (VERDICT r1 #10).

Real multi-chip hardware is not available in this environment; the 8
virtual CPU devices execute shards SEQUENTIALLY, so wall-clock cannot
show real speedup. What this records instead, per mesh size D at a real
problem shape:

  * total_s     — wall-clock of the sharded step (all D shards, serial)
  * overhead    — total_s / single_chip_s: the sharding overhead factor
                  (shard_map + all_gather + tree-combine); on real chips
                  speedup ~= D / overhead, so overhead <= 1.43 is the
                  >=70% scaling-efficiency north star (BASELINE.md)

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/bench_scaling.py [--n 16384] [--c 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 14)
    ap.add_argument("--c", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument(
        "--devices",
        type=str,
        default="2,4,8",
        help="comma-separated mesh sizes to sweep (single-chip always runs)",
    )
    ap.add_argument(
        "--shard",
        type=str,
        default="points,windows",
        help="comma-separated shard modes to sweep (points, windows)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lambdaworks_kzg_tpu.constants import R
    from lambdaworks_kzg_tpu.models import srs
    from lambdaworks_kzg_tpu.ops import g1_ops, msm as msm1
    from lambdaworks_kzg_tpu.parallel.mesh import make_mesh
    from lambdaworks_kzg_tpu.parallel.msm import make_msm_step

    n, c = args.n, args.c
    base = srs.create_dev_setup(256, secret=0x5CA1E)
    reps = n // 256
    pts, valid = g1_ops.make_points_host(base.g1_lagrange_brp)
    pts = jnp.tile(pts, (1, 1, reps))
    valid = jnp.tile(valid, (reps,))
    rng = np.random.default_rng(0)
    scalars = jnp.asarray(
        msm1.scalars_to_device(
            [int(x) % R for x in rng.integers(0, 2**63, n)]
        )
    )

    def timed(fn):
        jax.block_until_ready(fn())
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            best = min(best, time.perf_counter() - t0)
        return best

    single = timed(lambda: msm1.msm_device(pts, valid, scalars, c))
    print(f"n=2^{n.bit_length()-1} c={c}")
    print(f"D=1 (single-chip kernel): {single:.3f}s", flush=True)
    rows = [f"| 1 | — | {single:.3f} | 1.00 |"]
    shards = [s for s in args.shard.split(",") if s]
    for d in (int(x) for x in args.devices.split(",") if x):
        mesh = make_mesh(devices=jax.devices()[:d], data=1, points=d)
        for shard in shards:
            step = make_msm_step(mesh, c, shard)
            t = timed(lambda: step(pts, valid, scalars))
            print(
                f"D={d} ({shard}-sharded, serial emulation): {t:.3f}s "
                f"overhead {t/single:.2f}x -> projected efficiency "
                f"{100/ (t/single):.0f}%",
                flush=True,
            )
            rows.append(f"| {d} | {shard} | {t:.3f} | {t/single:.2f} |")
    print()
    print("| devices | shard | wall s (serial emulation) | overhead vs single |")
    print("|---|---|---|---|")
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
