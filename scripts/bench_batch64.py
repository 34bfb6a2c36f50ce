"""End-to-end batch-64 serving measurement (SURVEY §6 target shape:
verify_blob_kzg_proof_batch over 64 blobs).

Measures the full public-API pipeline on the default backend:
commit batch -> prove batch -> verify batch, warm best-of-N per stage.

    python scripts/bench_batch64.py [--batch 64] [--iters 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def best(fn, iters):
    fn()  # warm/compile
    t = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        t = min(t, time.perf_counter() - t0)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    from lambdaworks_kzg_tpu import EIP4844Context, FIELD_ELEMENTS_PER_BLOB

    print(f"backend={jax.default_backend()} batch={args.batch}")
    ctx = EIP4844Context()
    rng = np.random.default_rng(64)
    blobs = [
        b"".join(rng.bytes(31) + b"\x00" for _ in range(FIELD_ELEMENTS_PER_BLOB))
        for _ in range(args.batch)
    ]

    t_commit = best(lambda: ctx.blob_to_kzg_commitment_batch(blobs), args.iters)
    cs = ctx.blob_to_kzg_commitment_batch(blobs)
    t_prove = best(
        lambda: ctx.compute_blob_kzg_proof_batch(blobs, cs), args.iters
    )
    ps = ctx.compute_blob_kzg_proof_batch(blobs, cs)
    assert ctx.verify_blob_kzg_proof_batch(blobs, cs, ps)
    t_verify = best(
        lambda: ctx.verify_blob_kzg_proof_batch(blobs, cs, ps), args.iters
    )
    b = args.batch
    print(f"commit batch:  {t_commit*1e3:8.1f} ms  ({t_commit/b*1e3:6.2f} ms/blob)")
    print(f"prove batch:   {t_prove*1e3:8.1f} ms  ({t_prove/b*1e3:6.2f} ms/blob)")
    print(f"verify batch:  {t_verify*1e3:8.1f} ms  ({t_verify/b*1e3:6.2f} ms/blob)")


if __name__ == "__main__":
    main()
