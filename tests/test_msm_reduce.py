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


@pytest.mark.parametrize("c", [3, 4, 6])  # 4 divides 256; 6 does not
# (multi-fold alias merge); the generic path's top-window alias split
# must NOT leak into the fixed-base grid
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


def test_packed_key_sort_matches_argsort(monkeypatch):
    """The TPU packed-key member sort is bit-equal to stable argsort."""
    from lambdaworks_kzg_tpu.ops import dispatch, msm as M
    import jax.numpy as jnp

    monkeypatch.setattr(dispatch, "use_pallas", lambda: True)
    rng = np.random.default_rng(3)
    digits = jnp.asarray(rng.integers(0, 256, (5, 256)).astype(np.uint32))
    order_p, sd_p = M._sort_members(digits, 256, 8)
    monkeypatch.setattr(dispatch, "use_pallas", lambda: False)
    order_a, sd_a = M._sort_members(digits, 256, 8)
    assert np.array_equal(np.asarray(order_p), np.asarray(order_a))
    assert np.array_equal(np.asarray(sd_p), np.asarray(sd_a))


def test_generic_msm_nondividing_c():
    """c = 6 (256 % 6 != 0): the generalized top-window alias split must
    keep the lockstep correct and the merge must restore bucket sums."""
    setup = srs.create_dev_setup(N, secret=0xC6)
    points, valid = g1_ops.make_points_host(setup.g1_lagrange_brp)
    rng = random.Random(11)
    scalar_ints = [rng.randrange(R) for _ in range(N)]
    scalar_ints[1] = R - 1  # top bits set: exercises the top window
    scalars = msm.scalars_to_device(scalar_ints)
    got = msm.msm(points, valid, scalars, c=6)
    expected = HC.g1_msm(scalar_ints, setup.g1_lagrange_brp)
    assert HC.points_eq(HC.FP_OPS, got, expected)


def test_window_grouped_lockstep(monkeypatch):
    """The TPU multi-group (lane-capped) lockstep == host oracle.

    Shrinks the group-lane cap so the grouped lax.scan path runs at a
    toy size (the real cap only engages at 2^c > 8192 / W). The Pallas
    point kernels are swapped for the bit-identical XLA tier so the
    test compiles fast on CPU (interpret-mode Pallas inside the
    scan-of-while was a pathological XLA-CPU compile)."""
    from lambdaworks_kzg_tpu.ops import dispatch
    from lambdaworks_kzg_tpu.ops import msm as M

    monkeypatch.setattr(M, "_GROUP_LANES", 64)
    monkeypatch.setattr(dispatch, "use_pallas", lambda: True)
    monkeypatch.setattr(M, "_madd", g1_ops.madd)
    monkeypatch.setattr(M, "_add", g1_ops.add)
    monkeypatch.setattr(M, "_dbl", g1_ops.dbl)
    n = 16
    setup = srs.create_dev_setup(n, secret=0x6709)
    points, valid = g1_ops.make_points_host(setup.g1_lagrange_brp)
    rng = random.Random(13)
    scalar_ints = [rng.randrange(R) for _ in range(n)]
    scalars = msm.scalars_to_device(scalar_ints)
    got = msm.msm(points, valid, scalars, c=4)  # W=64, gsz=4: 16 groups
    expected = HC.g1_msm(scalar_ints, setup.g1_lagrange_brp)
    assert HC.points_eq(HC.FP_OPS, got, expected)
