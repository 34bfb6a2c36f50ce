"""Group law + serialization tests.

Mirrors the reference's compression unit tests (reference
src/compression.rs:142-222) behaviorally: generator bit layout, infinity
encoding, compress/decompress round-trips, known-answer SRS point.
"""

import random

import pytest

from lambdaworks_kzg_tpu.constants import R
from lambdaworks_kzg_tpu.host import curve as C

ops, ops2 = C.FP_OPS, C.FP2_OPS
G = C.G1_GENERATOR
G2 = C.G2_GENERATOR
random.seed(99)


def test_generator_on_curve_and_order():
    assert C.is_on_curve_affine(ops, C.to_affine(ops, G))
    assert C.is_infinity(ops, C.point_scalar_mul_raw(ops, G, R))
    assert C.is_on_curve_affine(ops2, C.to_affine(ops2, G2))
    assert C.is_infinity(ops2, C.point_scalar_mul_raw(ops2, G2, R))


def test_group_law_consistency():
    for _ in range(5):
        a, b = random.randrange(R), random.randrange(R)
        pa = C.point_scalar_mul(ops, G, a)
        pb = C.point_scalar_mul(ops, G, b)
        pab = C.point_scalar_mul(ops, G, (a + b) % R)
        assert C.points_eq(ops, C.point_add(ops, pa, pb), pab)
        # mixed addition agrees
        assert C.points_eq(
            ops, C.point_add_mixed(ops, pa, C.to_affine(ops, pb)), pab
        )


def test_double_vs_add():
    p5 = C.point_scalar_mul(ops, G, 5)
    assert C.points_eq(ops, C.point_double(ops, p5), C.point_add(ops, p5, p5))


def test_add_inverse_gives_infinity():
    p7 = C.point_scalar_mul(ops, G, 7)
    assert C.is_infinity(ops, C.point_add(ops, p7, C.point_neg(ops, p7)))


def test_compress_generator_bit_layout():
    # parity: reference compression.rs:168-180
    out = C.compress_g1(G)
    assert out.hex().startswith("97f1d3a7")
    assert out[0] & 0x80  # compressed bit
    assert not out[0] & 0x40  # not infinity


def test_infinity_encoding():
    # parity: reference compression.rs:183-189
    inf = C.infinity(ops)
    out = C.compress_g1(inf)
    assert out[0] == 0xC0 and all(b == 0 for b in out[1:])
    assert C.is_infinity(ops, C.decompress_g1(out))
    out2 = C.compress_g2(C.infinity(ops2))
    assert out2[0] == 0xC0 and all(b == 0 for b in out2[1:])
    assert C.is_infinity(ops2, C.decompress_g2(out2))


def test_g1_compress_roundtrip():
    # parity: reference compression.rs:192-209
    for k in (1, 2, 1234567, R - 1):
        pt = C.point_scalar_mul(ops, G, k)
        back = C.decompress_g1(C.compress_g1(pt))
        assert C.points_eq(ops, back, pt)


def test_g2_compress_roundtrip():
    for k in (1, 2, 987654321):
        pt = C.point_scalar_mul(ops2, G2, k)
        back = C.decompress_g2(C.compress_g2(pt))
        assert C.points_eq(ops2, back, pt)


def test_known_srs_point_roundtrip():
    # parity: reference compression.rs:212-221 (mainnet SRS hex point)
    hexpt = (
        "8d0c6eeadd3f8529d67246f77404a4ac2d9d7fd7d50cf103d3e6abb9003e5e36d8f322663ebced6707a7f46d97b7566d"
    )
    pt = C.decompress_g1(bytes.fromhex(hexpt))
    assert C.compress_g1(pt).hex() == hexpt


def test_decompress_rejects_garbage():
    with pytest.raises(C.DeserializationError):
        C.decompress_g1(bytes(48))  # compressed bit unset
    with pytest.raises(C.DeserializationError):
        C.decompress_g1(bytes([0xC0]) + bytes(46) + bytes([1]))  # dirty inf
    bad_x = bytearray(C.compress_g1(G))
    bad_x[-1] ^= 1  # tweak x -> (likely) non-residue or wrong subgroup
    try:
        pt = C.decompress_g1(bytes(bad_x))
        assert C.g1_in_subgroup(pt)  # if it decodes, invariant must hold
    except C.DeserializationError:
        pass


def test_subgroup_check_rejects_low_order():
    # Find an on-curve point NOT in G1: hash x until y^2 = x^3+4 is a QR,
    # then the point is in E(Fp); with overwhelming probability not in G1.
    from lambdaworks_kzg_tpu.host import field as F
    from lambdaworks_kzg_tpu.constants import P, B_G1

    x = 5
    while True:
        y2 = (x * x * x + B_G1) % P
        y = F.fp_sqrt(y2)
        if y is not None:
            pt = (x, y, 1)
            if not C.points_eq(ops, pt, G):
                break
        x += 1
    assert not C.g1_in_subgroup(pt)


def test_msm_matches_naive():
    n = 16
    pts_jac = [
        C.point_scalar_mul(ops, G, random.randrange(R)) for _ in range(n)
    ]
    pts = [C.to_affine(ops, p) for p in pts_jac]
    scalars = [random.randrange(R) for _ in range(n)]
    expect = C.infinity(ops)
    for s, pj in zip(scalars, pts_jac):
        expect = C.point_add(ops, expect, C.point_scalar_mul(ops, pj, s))
    got = C.g1_msm(scalars, pts)
    assert C.points_eq(ops, got, expect)


def test_msm_edge_cases():
    assert C.is_infinity(ops, C.g1_msm([], []))
    assert C.is_infinity(ops, C.g1_msm([0, 0], [C.to_affine(ops, G), None]))
    got = C.g1_msm([1], [C.to_affine(ops, G)])
    assert C.points_eq(ops, got, G)
