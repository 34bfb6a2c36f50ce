"""Device (ops/pairing_ops) vs native (C++ tier) pairing bench on chip.

The promotion decision for batched verification (VERDICT r2 #8): N
independent proof verifies = one 2N-lane device pairing_check vs N
sequential native pairings_verify calls. Records warm best-of-3 at
batch 1 / 16 / 64 and prints the winner per batch size.

Usage: python scripts/bench_pairing.py [--batches 1,16,64]
"""

import argparse
import math
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="1,16,64")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lambdaworks_kzg_tpu import native
    from lambdaworks_kzg_tpu.host import curve as HC
    from lambdaworks_kzg_tpu.models import srs
    from lambdaworks_kzg_tpu.ops import g1_batch, g1_ops, g2_ops, pairing_ops

    print(f"backend={jax.default_backend()} native={native.available()}",
          file=sys.stderr)
    setup = srs.load_mainnet_setup()
    rng = random.Random(42)

    # Protocol-shaped pairs: e(pi, [s-z]_2) == e(C - [y]_1, G2) instances
    g2_gen = setup.g2_monomial[0]
    g2_s = setup.g2_monomial[1]
    g1s = [p for p in setup.g1_lagrange_brp[:128] if p is not None]

    def rand_instance():
        a1 = HC.from_affine(HC.FP_OPS, g1s[rng.randrange(len(g1s))])
        b1 = HC.from_affine(HC.FP_OPS, g1s[rng.randrange(len(g1s))])
        a2 = HC.from_affine(HC.FP2_OPS, g2_s)
        b2 = HC.from_affine(HC.FP2_OPS, g2_gen)
        return a1, a2, b1, b2

    def to_dev(insts):
        def d1(pts):
            affs = [HC.to_affine(HC.FP_OPS, p) for p in pts]
            aff, valid = g1_ops.make_points_host(affs)
            return g1_batch.lift_affine(aff, valid)

        def d2(pts):
            affs = [HC.to_affine(HC.FP2_OPS, q) for q in pts]
            aff, valid = g2_ops.make_points_host(affs)
            return g2_ops.lift_affine(aff, valid)

        ps = jnp.concatenate(
            [pairing_ops.g1_neg(d1([a1 for a1, _, _, _ in insts])),
             d1([b1 for _, _, b1, _ in insts])], axis=-1)
        qs = jnp.concatenate(
            [d2([a2 for _, a2, _, _ in insts]),
             d2([b2 for _, _, _, b2 in insts])], axis=-1)
        return ps, qs

    def best(fn, iters):
        fn()  # warm/compile
        t = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            t = min(t, time.perf_counter() - t0)
        return t

    rows = []
    for b in (int(x) for x in args.batches.split(",")):
        insts = [rand_instance() for _ in range(b)]
        ps, qs = to_dev(insts)
        try:
            t_dev = best(
                lambda: np.asarray(pairing_ops.pairing_check(ps, qs)),
                args.iters,
            )
        except Exception as e:  # compile OOM/SIGKILL on small hosts must
            # not kill the bench — the native tier still gets measured
            print(f"batch {b}: device pairing unavailable ({e})",
                  file=sys.stderr)
            t_dev = float("nan")
        if native.available():
            insts_aff = [
                (
                    HC.to_affine(HC.FP_OPS, a1),
                    HC.to_affine(HC.FP2_OPS, a2),
                    HC.to_affine(HC.FP_OPS, b1),
                    HC.to_affine(HC.FP2_OPS, b2),
                )
                for a1, a2, b1, b2 in insts
            ]
            t_nat = best(
                lambda: [
                    native.pairings_verify_affine(a1, a2, b1, b2)
                    for a1, a2, b1, b2 in insts_aff
                ],
                args.iters,
            )
        else:
            t_nat = float("nan")
        # NaN compares false both ways: an unmeasured tier must not be
        # reported as the winner
        if math.isnan(t_nat) and math.isnan(t_dev):
            win = "n/a (neither tier measured)"
        elif math.isnan(t_nat):
            win = "device (native unavailable)"
        elif math.isnan(t_dev):
            win = "native (device unavailable)"
        else:
            win = "device" if t_dev < t_nat else "native"
        rows.append((b, t_dev * 1e3, t_nat * 1e3, win))
        print(f"batch {b:3d}: device {t_dev*1e3:8.1f} ms  "
              f"native {t_nat*1e3:8.1f} ms  -> {win}", flush=True)

    print("\n| batch | device ms | native ms | winner |")
    print("|---|---|---|---|")
    for b, d, n_, w in rows:
        print(f"| {b} | {d:.1f} | {n_:.1f} | {w} |")


if __name__ == "__main__":
    main()
