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
    args = ap.parse_args()
    batches = [int(b) for b in args.batch_sizes.split(",") if b]

    import jax

    from lambdaworks_kzg_tpu import EIP4844Context, load_trusted_setup_file

    print(f"[prewarm] backend: {jax.default_backend()}", file=sys.stderr)
    print(
        f"[prewarm] cache: {jax.config.jax_compilation_cache_dir}",
        file=sys.stderr,
    )
    t0 = time.time()
    if args.setup:
        ctx = EIP4844Context(load_trusted_setup_file(args.setup))
    else:
        ctx = EIP4844Context()
    print(f"[prewarm] setup loaded in {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    ctx.warmup(batch_sizes=batches)
    print(f"[prewarm] warmup done in {time.time()-t0:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
