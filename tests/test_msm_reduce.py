"""Bucket reduce + fixed-base MSM == host oracle (small shapes)."""

import random

import numpy as np

from lambdaworks_kzg_tpu.constants import R
from lambdaworks_kzg_tpu.host import curve as HC
from lambdaworks_kzg_tpu.models import srs
from lambdaworks_kzg_tpu.ops import g1_ops, msm

C_BITS = 3
N = 32


def test_scan_reduce_matches_oracle():
    setup = srs.create_dev_setup(N, secret=0xF01D)
    points, valid = g1_ops.make_points_host(setup.g1_lagrange_brp)
    rng = random.Random(5)
    scalar_ints = [rng.randrange(R) for _ in range(N)]
    scalars = msm.scalars_to_device(scalar_ints)
    buckets = msm.bucket_accumulate(points, valid, scalars, C_BITS)
    ws = msm.bucket_reduce(buckets, C_BITS)
    pt = msm.combine_windows_host(np.asarray(ws), C_BITS)
    expected = HC.g1_msm(scalar_ints, setup.g1_lagrange_brp)
    assert HC.points_eq(HC.FP_OPS, pt, expected)


import pytest


@pytest.mark.parametrize("c", [3, 4])  # 4 divides 256: the generic
# path's top-window alias split must NOT leak into the fixed-base grid
def test_fixedbase_matches_generic(c):
    """Precomputed-table MSM == generic kernel == host oracle, including
    zero scalars and an infinity source lane."""
    setup = srs.create_dev_setup(N, secret=0xFB)
    pts_aff = list(setup.g1_lagrange_brp)
    pts_aff[3] = None  # infinity lane must stay dead in every window
    points, valid = g1_ops.make_points_host(pts_aff)
    rng = random.Random(9)
    scalar_ints = [rng.randrange(R) for _ in range(N)]
    scalar_ints[0] = 0
    scalars = msm.scalars_to_device(scalar_ints)

    table, table_valid = msm.build_fixedbase_tables(points, valid, c)
    got = msm.msm_fixedbase(table, table_valid, scalars, c=c, groups=4)
    expected = HC.g1_msm(scalar_ints, pts_aff)
    assert HC.points_eq(HC.FP_OPS, got, expected)

    generic = msm.msm(points, valid, scalars, c=c)
    assert HC.points_eq(HC.FP_OPS, generic, expected)
