"""Pre-populate the persistent XLA compile cache for the protocol shapes.

Run once per machine (or bake into an image):

    python scripts/prewarm.py [--batch-sizes 16,64] [--setup PATH]

Compiles every kernel the seven entry points use at the mainnet 4096
shape via EIP4844Context.warmup(); later processes sharing the cache
(LWKZG_COMPILE_CACHE, default ~/.cache/lambdaworks_kzg_tpu/jax) start at
steady-state latency. Fixes the cold-start problem: the fused limb
kernels are minutes-long XLA compiles on both TPU and CPU backends.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-sizes", default="16")
    ap.add_argument("--setup", default=None)
    ap.add_argument(
        "--big-msm",
        action="store_true",
        help="also warm the 2^20 generic-MSM shapes bench.py sweeps "
        "(c=8/12 at scalar_bits 255, c=12 at 248)",
    )
    ap.add_argument(
        "--bundle",
        default=None,
        metavar="DIR",
        help="after warmup, copy the XLA cache entries this run produced "
        "or touched into DIR (a site bundle for machine images; "
        "lambdaworks_kzg_tpu seeds the per-user cache from "
        "cache/tpu_jax_cache at import when it exists). Entries are "
        "~100-280 MB each — bake them into images, don't commit them.",
    )
    args = ap.parse_args()
    batches = [int(b) for b in args.batch_sizes.split(",") if b]

    import jax

    from lambdaworks_kzg_tpu import EIP4844Context, load_trusted_setup_file

    print(f"[prewarm] backend: {jax.default_backend()}", file=sys.stderr)
    print(
        f"[prewarm] cache: {jax.config.jax_compilation_cache_dir}",
        file=sys.stderr,
    )
    cache_dir = jax.config.jax_compilation_cache_dir
    pre_state = {}
    if args.bundle and cache_dir and os.path.isdir(cache_dir):
        pre_state = {
            name: os.path.getmtime(os.path.join(cache_dir, name))
            for name in os.listdir(cache_dir)
        }
    t0 = time.time()
    if args.setup:
        ctx = EIP4844Context(load_trusted_setup_file(args.setup))
    else:
        ctx = EIP4844Context()
    print(f"[prewarm] setup loaded in {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    ctx.warmup(batch_sizes=batches)
    print(f"[prewarm] warmup done in {time.time()-t0:.1f}s", file=sys.stderr)

    if args.big_msm:
        _warm_big_msm(ctx)

    if args.bundle and cache_dir and os.path.isdir(cache_dir):
        import shutil

        os.makedirs(args.bundle, exist_ok=True)
        copied = 0
        for name in os.listdir(cache_dir):
            src = os.path.join(cache_dir, name)
            if pre_state.get(name) == os.path.getmtime(src):
                continue  # pre-existing entry this run never touched
            shutil.copyfile(src, os.path.join(args.bundle, name))
            copied += 1
        print(f"[prewarm] bundled {copied} cache entries -> {args.bundle}",
              file=sys.stderr)


def _warm_big_msm(ctx):
    """Compile (and AOT-export) the 2^20 generic-MSM variants bench.py
    sweeps, so a bench on a warmed machine measures kernels, not
    compiles."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lambdaworks_kzg_tpu.ops import aot, msm as msm1

    backend = ctx.kzg.backend
    if not hasattr(backend, "points"):
        print("[prewarm] host backend: no device MSM shapes to warm",
              file=sys.stderr)
        return
    n_big = 1 << 20
    reps = n_big // backend.n
    big_pts = jnp.tile(backend.points, (1, 1, reps))
    big_valid = jnp.tile(backend.valid, (reps,))
    rng = np.random.default_rng(7)
    sc = rng.integers(0, 1 << 16, (16, n_big), dtype=np.uint32)
    sc[15] &= 0x7FFF
    big_scalars = jnp.asarray(sc)
    for c, sb in ((8, 255), (12, 255), (12, 248)):
        t0 = time.time()
        jax.block_until_ready(
            aot.call(
                "msm_device",
                msm1.msm_device,
                (big_pts, big_valid, big_scalars),
                static=(("c", c), ("scalar_bits", sb)),
            )
        )
        print(
            f"[prewarm] 2^20 msm c={c} sb={sb}: {time.time()-t0:.1f}s",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
