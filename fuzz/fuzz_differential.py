"""Differential + robustness fuzzer for the 7 EIP-4844 entry points.

The analog of the reference's six libFuzzer targets (reference
fuzz/<fn>/fuzz.c, exact-size gated per fuzz/Makefile:64-86) and its Go
corpus generator (fuzz/gen_corpus/main.go): here one process fuzzes
  * robustness: size-gated random/mutated inputs must never crash —
    every failure is a clean KZGError;
  * differential: structurally-valid random inputs must produce
    IDENTICAL results through the host-oracle tier and the device tier.

Usage:
  python fuzz/fuzz_differential.py [--iters N] [--setup PATH] [--seed S]
"""

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lambdaworks_kzg_tpu import EIP4844Context, KZGError, load_trusted_setup_file
from lambdaworks_kzg_tpu.models.kzg import HostBackend


def rand_blob(rng: random.Random, n: int) -> bytes:
    return b"".join(
        rng.randrange(2**248).to_bytes(31, "little") + b"\x00" for _ in range(n)
    )


def mutate(rng: random.Random, data: bytes) -> bytes:
    data = bytearray(data)
    for _ in range(rng.randrange(1, 8)):
        op = rng.randrange(3)
        if op == 0 and data:
            data[rng.randrange(len(data))] ^= 1 << rng.randrange(8)
        elif op == 1 and data:
            del data[rng.randrange(len(data))]
        else:
            data.insert(rng.randrange(len(data) + 1), rng.randrange(256))
    return bytes(data)


def run(iters: int, setup_path: str, seed: int) -> int:
    rng = random.Random(seed)
    setup = load_trusted_setup_file(setup_path)
    host_ctx = EIP4844Context(setup, backend=HostBackend(setup))
    device_ctx = EIP4844Context(setup)
    dual = host_ctx.kzg.backend is not device_ctx.kzg.backend
    n = setup.n

    failures = 0
    for i in range(iters):
        blob = rand_blob(rng, n)
        # -- differential: valid inputs, both tiers must agree -----------
        c_host = host_ctx.blob_to_kzg_commitment(blob)
        if dual:
            c_dev = device_ctx.blob_to_kzg_commitment(blob)
            if c_host != c_dev:
                print(f"[{i}] DIFF commit mismatch"); failures += 1
        z = rng.randrange(1 << 255).to_bytes(32, "little")
        try:
            p_host, y_host = host_ctx.compute_kzg_proof(blob, z)
            if dual:
                p_dev, y_dev = device_ctx.compute_kzg_proof(blob, z)
                if (p_host, y_host) != (p_dev, y_dev):
                    print(f"[{i}] DIFF proof mismatch"); failures += 1
            if not host_ctx.verify_kzg_proof(c_host, z, y_host, p_host):
                print(f"[{i}] valid proof rejected"); failures += 1
        except KZGError:
            pass  # z >= r is a legitimate rejection

        # -- robustness: mutated inputs must raise KZGError, not crash ---
        for fn, args in (
            ("blob_to_kzg_commitment", (mutate(rng, blob),)),
            ("compute_kzg_proof", (mutate(rng, blob), mutate(rng, z))),
            ("compute_blob_kzg_proof", (blob, mutate(rng, c_host))),
            ("verify_blob_kzg_proof", (mutate(rng, blob), c_host, mutate(rng, c_host))),
        ):
            try:
                getattr(host_ctx, fn)(*args)
            except KZGError:
                pass
            except Exception as e:  # anything else is a fuzz finding
                print(f"[{i}] CRASH {fn}: {type(e).__name__}: {e}")
                failures += 1
        if (i + 1) % 10 == 0:
            print(f"  {i + 1}/{iters} ok", flush=True)
    return failures


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument(
        "--setup",
        default="/root/reference/tests/trusted_setup_4.txt",
        help="small setups fuzz much faster",
    )
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rc = run(args.iters, args.setup, args.seed)
    print("FAILURES:", rc)
    sys.exit(1 if rc else 0)
