"""Hardware correctness gate for the shipped c=12 window size.

Runs the generic MSM device kernel on the REAL chip over the mainnet
4096-point SRS at (c=12, scalar_bits=255) and (c=12, scalar_bits=248)
and bit-compares against the pure-Python host oracle. The c=12 CPU
oracle tests (tests/test_msm_reduce.py slow tier) cost ~45 one-core
minutes each; this is the same gate in seconds of chip runtime.

    python scripts/check_c12_onchip.py | tee testdata/DEVICE_C12_r05.txt
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    import lambdaworks_kzg_tpu  # noqa: F401  (compile cache config)
    from lambdaworks_kzg_tpu.constants import R
    from lambdaworks_kzg_tpu.host import curve as HC
    from lambdaworks_kzg_tpu.models import srs
    from lambdaworks_kzg_tpu.ops import g1_ops, msm

    print(f"# device c=12 MSM vs host oracle — backend={jax.default_backend()}"
          f" kind={jax.devices()[0].device_kind}")
    setup = srs.load_mainnet_setup()
    points, valid = g1_ops.make_points_host(setup.g1_lagrange_brp)
    rng = random.Random(0xC12)

    for sb in (255, 248):
        bound = R if sb >= 255 else (1 << sb)
        ints = [rng.randrange(bound) for _ in range(setup.n)]
        ints[0] = 0
        ints[1] = bound - 1
        scalars = msm.scalars_to_device(ints)
        t0 = time.time()
        got = msm.msm(points, valid, scalars, c=12, scalar_bits=sb)
        dt = time.time() - t0
        expected = HC.g1_msm(ints, setup.g1_lagrange_brp)
        ok = HC.points_eq(HC.FP_OPS, got, expected)
        print(f"c=12 scalar_bits={sb}: {'OK' if ok else 'MISMATCH'} "
              f"(4096-point mainnet MSM, incl-compile {dt:.1f}s)")
        if not ok:
            sys.exit(1)
    print("# both scalar_bits variants bit-identical to the host oracle")


if __name__ == "__main__":
    main()
