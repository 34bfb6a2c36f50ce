"""The two bucket-reduce algorithms produce identical bits."""

import random

import jax.numpy as jnp
import numpy as np

from lambdaworks_kzg_tpu.constants import R
from lambdaworks_kzg_tpu.models import srs
from lambdaworks_kzg_tpu.ops import g1_ops, msm

C_BITS = 3
N = 32


def test_fold_equals_scan():
    setup = srs.create_dev_setup(N, secret=0xF01D)
    points, valid = g1_ops.make_points_host(setup.g1_lagrange_brp)
    rng = random.Random(5)
    scalars = msm.scalars_to_device([rng.randrange(R) for _ in range(N)])
    buckets = msm.bucket_accumulate(points, valid, scalars, C_BITS)
    arr = msm._merge_top_aliases(msm._zero_bucket0(buckets, C_BITS), C_BITS)
    fold = msm._bucket_reduce_fold(arr, C_BITS)
    scan = msm._bucket_reduce_scan(arr, C_BITS)
    # different addition orders give different Jacobian Z: compare as
    # group elements, window by window
    from lambdaworks_kzg_tpu.host import curve as HC

    fold_pts = g1_ops.points_to_host(np.asarray(fold))
    scan_pts = g1_ops.points_to_host(np.asarray(scan))
    assert len(fold_pts) == len(scan_pts)
    for a, b in zip(fold_pts, scan_pts):
        assert HC.points_eq(HC.FP_OPS, a, b)
    # and the window combine agrees with the host oracle
    pt = msm.combine_windows_host(np.asarray(fold), C_BITS)
    expected = HC.g1_msm(
        [int(x) for x in msm.lb.limbs_to_ints(np.asarray(scalars))],
        setup.g1_lagrange_brp,
    )
    assert HC.points_eq(HC.FP_OPS, pt, expected)
