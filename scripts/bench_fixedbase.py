"""Fixed-base commit MSM sweep on chip: window bits c x lane groups G.

The 4096-point SRS commit is the protocol hot path (BASELINE.md headline
metric); its fixed-base kernel cost is ~members x (gather + madd) with a
bucket-skew factor that depends on (c, G). This sweeps the grid and
reports pipelined ms/MSM (16 async dispatches, one sync — the serving
shape; sync latency through the dev tunnel is RTT-bound).

Usage: python scripts/bench_fixedbase.py [--cs 8,10,12] [--gs 8,16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cs", type=str, default="8,10,12")
    ap.add_argument("--gs", type=str, default="8,16")
    ap.add_argument("--pipeline", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import lambdaworks_kzg_tpu  # noqa: F401 (compile cache config)
    from lambdaworks_kzg_tpu.models import srs
    from lambdaworks_kzg_tpu.ops import codec, g1_ops, msm

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    setup = srs.load_mainnet_setup()
    points, valid = g1_ops.make_points_host(setup.g1_lagrange_brp)
    rng = np.random.default_rng(7)
    blobs = [
        b"".join(rng.bytes(31) + b"\x00" for _ in range(setup.n))
        for _ in range(args.pipeline)
    ]
    dls = [jnp.asarray(codec.blob_to_limbs(b, setup.n)) for b in blobs]

    rows = []
    for c in (int(x) for x in args.cs.split(",")):
        table, tvalid = msm.build_fixedbase_tables(points, valid, c)
        table = jax.block_until_ready(table)
        for g in (int(x) for x in args.gs.split(",")):
            run = lambda: jax.block_until_ready(
                [msm.msm_fixedbase_device(table, tvalid, d, c, g) for d in dls]
            )
            try:
                t0 = time.perf_counter()
                run()
                print(f"c={c} G={g} first call {time.perf_counter()-t0:.1f}s",
                      file=sys.stderr, flush=True)
                best = float("inf")
                for _ in range(args.iters):
                    t0 = time.perf_counter()
                    run()
                    best = min(best, time.perf_counter() - t0)
                ms = best / args.pipeline * 1e3
                rows.append((c, g, ms))
                print(f"c={c} G={g}: {ms:.2f} ms/MSM pipelined", flush=True)
            except Exception as e:
                print(f"c={c} G={g} failed: {e}", flush=True)

    print("\n| c | groups | pipelined ms/MSM |")
    print("|---|---|---|")
    for c, g, ms in sorted(rows, key=lambda r: r[2]):
        print(f"| {c} | {g} | {ms:.2f} |")


if __name__ == "__main__":
    main()
