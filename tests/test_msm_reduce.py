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


@pytest.mark.slow  # ~5 one-core minutes of XLA CPU compile; verified
# green in round 5 (full tier / CI)
def test_split_accumulate_matches_oracle():
    """The split bucket-accumulate tier (ops/msm._auto_split_parts):
    when c + log2(n) > 32 the packed-key sort no longer fits a u32 key
    (2^21 at the shipped c=12), so the point set is split into parts
    whose grids lane-add into one bucket grid for the ordinary reduce.
    parts > 1 must agree with the host oracle and with parts = 1
    (projective equality — Jacobian representatives differ), including
    an infinity lane, a zero scalar, and the top-window alias split."""
    setup = srs.create_dev_setup(N, secret=0x5117)
    pts_aff = list(setup.g1_lagrange_brp)
    pts_aff[5] = None  # infinity lane inside the second part
    points, valid = g1_ops.make_points_host(pts_aff)
    rng = random.Random(23)
    scalar_ints = [rng.randrange(R) for _ in range(N)]
    scalar_ints[0] = 0
    scalar_ints[2] = R - 1  # top window exercised in part 0
    scalars = msm.scalars_to_device(scalar_ints)
    expected = HC.g1_msm(scalar_ints, pts_aff)
    for parts in (1, 4):
        grid = msm.bucket_accumulate(
            points, valid, scalars, C_BITS, parts=parts
        )
        pt = msm.combine_windows_host(
            np.asarray(msm.bucket_reduce(grid, C_BITS)), C_BITS
        )
        assert HC.points_eq(HC.FP_OPS, pt, expected), f"parts={parts}"


def test_auto_split_parts_thresholds():
    """Auto part count trips exactly at the u32 packed-key boundary."""
    assert msm._auto_split_parts(1 << 20, 12) == 1
    assert msm._auto_split_parts(1 << 21, 12) == 2
    assert msm._auto_split_parts(1 << 22, 12) == 4
    assert msm._auto_split_parts(1 << 12, 8) == 1
    assert msm._auto_split_parts(1 << 21, 8) == 1  # 8 + 21 <= 32
    assert msm._auto_split_parts((1 << 21) - 8, 12) == 1  # non-pow2: argsort


@pytest.mark.parametrize(
    "c,scalar_bits",
    [
        # the two c=12 cases compile ~90k-lane XLA CPU graphs (minutes
        # cold): full-suite/CI tier only
        pytest.param(12, 255, marks=pytest.mark.slow),  # shipped 2^18+ c
        pytest.param(12, 248, marks=pytest.mark.slow),  # 31-byte-packed
        (8, 248),   # c divides scalar_bits: alias split must no-op
        (4, 16),    # narrow scalars, c divides sb
        (6, 16),    # narrow scalars, non-dividing (t=4, 4-way split)
    ],
)
def test_scalar_bits_variants(c, scalar_bits):
    """The static scalar_bits bound (ops/msm.prepare_digits): fewer
    windows, top-window alias split at the entropy boundary — results
    must stay bit-identical to the host oracle. c=12 is the production
    default at n >= 2^18 (ops/backend._auto_window) and was previously
    untested on the CPU oracle path."""
    setup = srs.create_dev_setup(N, secret=0x5B17 + c)
    points, valid = g1_ops.make_points_host(setup.g1_lagrange_brp)
    rng = random.Random(17 + c + scalar_bits)
    bound = R if scalar_bits >= 255 else (1 << scalar_bits)
    scalar_ints = [rng.randrange(bound) for _ in range(N)]
    scalar_ints[0] = 0
    scalar_ints[1] = bound - 1  # top window's highest digit exercised
    scalars = msm.scalars_to_device(scalar_ints)
    got = msm.msm(points, valid, scalars, c=c, scalar_bits=scalar_bits)
    expected = HC.g1_msm(scalar_ints, setup.g1_lagrange_brp)
    assert HC.points_eq(HC.FP_OPS, got, expected)


@pytest.mark.parametrize(
    "c,scalar_bits", [(12, 255), (12, 248), (8, 248), (13, 255), (6, 16)]
)
def test_prepare_digits_reconstructs_scalars(c, scalar_bits):
    """Digit-level gate for every (c, scalar_bits) shape — fast enough
    for the default tier (the end-to-end c=12 MSM tests above cost ~45
    one-core minutes each and run in the slow/CI tier).

    Undoing the top-window alias split (digit mod 2^t for the occupied
    alias lanes) and Horner-recombining the digits must reproduce every
    scalar exactly; invalid lanes must be all-zero digits."""
    import jax.numpy as jnp

    from lambdaworks_kzg_tpu.ops import limbs as lb

    n = 64
    rng = random.Random(100 + c)
    bound = R if scalar_bits >= 255 else (1 << scalar_bits)
    ints = [rng.randrange(bound) for _ in range(n)]
    ints[0] = 0
    ints[1] = bound - 1
    valid = np.ones(n, dtype=bool)
    valid[2] = False  # digits must zero out
    scalars = jnp.asarray(lb.ints_to_limbs(ints, 16))
    digits = np.array(
        msm.prepare_digits(scalars, jnp.asarray(valid), c, scalar_bits)
    )
    w_eff = msm.num_windows(c, scalar_bits)
    assert digits.shape == (w_eff, n)
    t_bits = msm._top_bits(c, scalar_bits)
    top = digits[-1].copy()
    # un-alias: occupied lanes carry digit + alias * 2^t with digit in
    # [1, 2^t); zero lanes stay zero
    unaliased = np.where(top == 0, 0, ((top - 1) % (1 << t_bits)) + 1)
    digits[-1] = unaliased
    for i in range(n):
        got = 0
        for w in range(w_eff - 1, -1, -1):
            got = (got << c) | int(digits[w, i])
        assert got == (ints[i] if valid[i] else 0), f"lane {i}"


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
