"""Batched device G1 utilities vs host oracles (scalar mul, subgroup,
decompression, G1 FFT)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from lambdaworks_kzg_tpu.constants import P, R
from lambdaworks_kzg_tpu.host import curve as HC
from lambdaworks_kzg_tpu.host import fft as HFFT
from lambdaworks_kzg_tpu.host.field import fp_sqrt
from lambdaworks_kzg_tpu.models import srs
from lambdaworks_kzg_tpu.ops import g1_batch, g1_ops, limbs as lb

N = 8


@pytest.fixture(scope="module")
def dev_setup():
    return srs.create_dev_setup(N, secret=0xFACE)


@pytest.fixture(scope="module")
def jac_points(dev_setup):
    aff, valid = g1_ops.make_points_host(dev_setup.g1_lagrange_brp)
    return g1_batch.lift_affine(aff, valid)


def test_scalar_mul_fixed(dev_setup, jac_points):
    k = 0xDEADBEEF12345678
    got = g1_batch.scalar_mul_fixed(jac_points, k)
    host = g1_ops.points_to_host(got)
    for pt, aff in zip(host, dev_setup.g1_lagrange_brp):
        expected = HC.point_scalar_mul(
            HC.FP_OPS, HC.from_affine(HC.FP_OPS, aff), k
        )
        assert HC.points_eq(HC.FP_OPS, pt, expected)


def test_scalar_mul_per_lane(dev_setup, jac_points):
    rng = random.Random(3)
    ks = [rng.randrange(R) for _ in range(N)]
    got = g1_batch.scalar_mul_per_lane(
        jac_points, jnp.asarray(lb.ints_to_limbs(ks, 16))
    )
    host = g1_ops.points_to_host(got)
    for pt, aff, k in zip(host, dev_setup.g1_lagrange_brp, ks):
        expected = HC.point_scalar_mul(
            HC.FP_OPS, HC.from_affine(HC.FP_OPS, aff), k
        )
        assert HC.points_eq(HC.FP_OPS, pt, expected)


def _non_subgroup_point():
    """Find an on-curve point outside G1 (cofactor > 1 makes them common)."""
    x = 2
    while True:
        y = fp_sqrt((x * x % P) * x % P + 4)
        if y is not None:
            pt = (x, y, 1)
            if not HC.g1_in_subgroup(pt):
                return (x, y)
        x += 1


def test_subgroup_mask(dev_setup):
    bad = _non_subgroup_point()
    points = dev_setup.g1_lagrange_brp[: N - 1] + [bad]
    aff, valid = g1_ops.make_points_host(points)
    mask = np.asarray(g1_batch.subgroup_mask(g1_batch.lift_affine(aff, valid)))
    assert list(mask) == [True] * (N - 1) + [False]


def test_decompress_batch_matches_host(dev_setup):
    rng = random.Random(4)
    compressed = [
        HC.compress_g1(HC.from_affine(HC.FP_OPS, aff))
        for aff in dev_setup.g1_lagrange_brp
    ]
    compressed.append(bytes([0xC0]) + bytes(47))  # infinity
    pts, is_inf, err = g1_batch.decompress_batch(compressed)
    assert not err.any()
    assert list(np.asarray(is_inf)) == [False] * N + [True]
    # round-trip: recompress from decompressed coordinates
    jac = g1_batch.lift_affine(pts, ~np.asarray(is_inf))
    for i, host_pt in enumerate(g1_ops.points_to_host(jac)):
        assert HC.compress_g1(host_pt) == compressed[i]


def test_decompress_batch_rejects():
    bad_inputs = [
        bytes([0x00]) + bytes(47),            # uncompressed bit missing
        bytes([0xC0]) + b"\x01" + bytes(46),  # non-canonical infinity
        bytes([0xE0]) + bytes(47),            # infinity with sign bit
        bytes([0x9F]) + b"\xff" * 47,         # x >= p
        bytes([0x80]) + bytes(47),            # x=0 -> rhs=4 is a QR; but
    ]
    pts, is_inf, err = g1_batch.decompress_batch(bad_inputs, subgroup_check=True)
    assert list(err[:4]) == [True] * 4
    # x=0: y^2=4 -> on curve, but (0,2) is not in the subgroup
    assert err[4]


def test_decompress_rejects_non_qr():
    # find x whose rhs is not a QR
    x = 1
    while fp_sqrt((x * x % P) * x % P + 4) is not None:
        x += 1
    data = bytearray(x.to_bytes(48, "big"))
    data[0] |= 0x80
    pts, is_inf, err = g1_batch.decompress_batch([bytes(data)])
    assert err[0]


def test_g1_fft_device(dev_setup):
    jacs = [HC.from_affine(HC.FP_OPS, aff) for aff in dev_setup.g1_monomial]
    expected = HFFT.g1_fft(jacs, inverse=True)
    aff, valid = g1_ops.make_points_host(dev_setup.g1_monomial)
    got = g1_batch.g1_fft_device(
        g1_batch.lift_affine(aff, valid), inverse=True
    )
    for pt, exp in zip(g1_ops.points_to_host(got), expected):
        assert HC.points_eq(HC.FP_OPS, pt, exp)
