"""Native C++ tier vs the pure-Python oracle (pairing, subgroup, muls)."""

import random

import pytest

from lambdaworks_kzg_tpu import native
from lambdaworks_kzg_tpu.constants import P, R
from lambdaworks_kzg_tpu.host import curve as HC
from lambdaworks_kzg_tpu.host.field import fp_sqrt
from lambdaworks_kzg_tpu.host.pairing import pairings_verify
from lambdaworks_kzg_tpu.models import srs
from lambdaworks_kzg_tpu.models.kzg import KZG, HostBackend

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native tier not built"
)

OPS, OPS2 = HC.FP_OPS, HC.FP2_OPS


@pytest.fixture(scope="module")
def kzg():
    setup = srs.create_dev_setup(8, secret=0x1234)
    return KZG(setup, backend=HostBackend(setup))


def test_pairing_matches_oracle(kzg):
    rng = random.Random(5)
    for trial in range(3):
        evals = [rng.randrange(R) for _ in range(8)]
        commitment = kzg.commit(evals)
        z = rng.randrange(R)
        proof, y = kzg.open(evals, z)
        p_minus_y = HC.point_add(
            OPS,
            commitment,
            HC.point_neg(OPS, HC.point_scalar_mul(OPS, HC.G1_GENERATOR, y)),
        )
        x_minus_z = HC.point_add(
            OPS2,
            kzg.g2_s,
            HC.point_neg(OPS2, HC.point_scalar_mul(OPS2, HC.G2_GENERATOR, z)),
        )
        for b2, label in ((x_minus_z, "good"), (kzg.g2_s, "bad")):
            exp = pairings_verify(p_minus_y, kzg.g2_one, proof, b2)
            got = native.pairings_verify_affine(
                HC.to_affine(OPS, p_minus_y),
                HC.to_affine(OPS2, kzg.g2_one),
                HC.to_affine(OPS, proof),
                HC.to_affine(OPS2, b2),
            )
            assert got == exp, f"trial {trial} {label}"


def test_pairing_with_infinity_operands(kzg):
    g = HC.to_affine(OPS, HC.G1_GENERATOR)
    g2 = HC.to_affine(OPS2, HC.G2_GENERATOR)
    # all-infinity on one side: product over no pairs == 1 on both sides
    assert native.pairings_verify_affine(None, g2, None, g2)
    # e(G, G2) == e(G, G2)
    assert native.pairings_verify_affine(g, g2, g, g2)
    # e(G, G2) != 1 (one real pair vs skipped pair)
    assert not native.pairings_verify_affine(g, g2, None, g2)


def _non_subgroup_point():
    x = 2
    while True:
        y = fp_sqrt((x * x % P) * x % P + 4)
        if y is not None and not HC._g1_in_subgroup_py((x, y, 1)):
            return (x, y)
        x += 1


def test_subgroup_checks_match_oracle():
    g = HC.to_affine(OPS, HC.G1_GENERATOR)
    assert native.g1_in_subgroup_affine(g)
    bad = _non_subgroup_point()
    assert not native.g1_in_subgroup_affine(bad)
    assert native.g1_in_subgroup_affine(bad) == HC._g1_in_subgroup_py(
        (bad[0], bad[1], 1)
    )
    g2 = HC.to_affine(OPS2, HC.G2_GENERATOR)
    assert native.g2_in_subgroup_affine(g2)


def test_scalar_muls_match_oracle():
    rng = random.Random(6)
    g = HC.to_affine(OPS, HC.G1_GENERATOR)
    g2 = HC.to_affine(OPS2, HC.G2_GENERATOR)
    for _ in range(3):
        k = rng.randrange(R)
        assert native.g1_scalar_mul_affine(g, k) == HC.to_affine(
            OPS, HC.point_scalar_mul(OPS, HC.G1_GENERATOR, k)
        )
        assert native.g2_scalar_mul_affine(g2, k) == HC.to_affine(
            OPS2, HC.point_scalar_mul(OPS2, HC.G2_GENERATOR, k)
        )
    # k = 0 -> infinity
    assert native.g1_scalar_mul_affine(g, 0) is None
    assert native.g2_scalar_mul_affine(g2, 0) is None


def test_kzg_verify_uses_native_and_agrees(kzg, monkeypatch):
    rng = random.Random(7)
    evals = [rng.randrange(R) for _ in range(8)]
    commitment = kzg.commit(evals)
    z = rng.randrange(R)
    proof, y = kzg.open(evals, z)
    assert kzg.verify(commitment, z, y, proof)  # native path
    assert not kzg.verify(commitment, z, (y + 1) % R, proof)
    # force the pure path and compare
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    assert kzg.verify(commitment, z, y, proof)
    assert not kzg.verify(commitment, z, (y + 1) % R, proof)


def test_g1_decompress_matches_oracle():
    """Valid points, infinity, and every rejection class agree with
    host/curve.decompress_g1 (the serving decompression tier)."""
    rng = random.Random(31)
    for _ in range(10):
        pt = HC.point_scalar_mul(OPS, HC.G1_GENERATOR, rng.randrange(1, R))
        comp = HC.compress_g1(pt)
        assert native.g1_decompress(comp) == HC.to_affine(
            OPS, HC.decompress_g1(comp)
        )
    assert native.g1_decompress(HC.compress_g1(HC.infinity(OPS))) is None

    def rejects(data):
        with pytest.raises(ValueError):
            native.g1_decompress(bytes(data))
        with pytest.raises(HC.DeserializationError):
            HC.decompress_g1(bytes(data))

    rejects(b"\x00" * 48)                      # uncompressed bit unset
    rejects(b"\xc0" + b"\x01" + b"\x00" * 46)  # bad infinity encoding
    over_p = bytearray(P.to_bytes(48, "big"))
    over_p[0] |= 0x80
    rejects(over_p)                            # x >= p
    x = 5
    while fp_sqrt((x * x * x + 4) % P) is not None:
        x += 1
    off = bytearray(x.to_bytes(48, "big"))
    off[0] |= 0x80
    rejects(off)                               # not on curve
    x = 3
    while True:
        y = fp_sqrt((x * x * x + 4) % P)
        if y is not None and not HC.g1_in_subgroup((x, y, 1)):
            break
        x += 1
    rogue = bytearray(x.to_bytes(48, "big"))
    rogue[0] |= 0x80
    if y > P - y:
        rogue[0] |= 0x20
    rejects(rogue)                             # on curve, wrong subgroup


def test_g1_msm_matches_oracle():
    """Small-MSM tier (batch-verify lincombs) vs the Python Pippenger,
    including infinity inputs and the all-zero-scalar sum."""
    rng = random.Random(32)
    for n in (1, 2, 17, 64, 80):
        scalars = [rng.randrange(R) for _ in range(n)]
        affs = [
            HC.to_affine(
                OPS, HC.point_scalar_mul(OPS, HC.G1_GENERATOR, rng.randrange(1, R))
            )
            for _ in range(n)
        ]
        if n >= 17:
            affs[3] = None  # infinity input lane
        want = HC.g1_msm(scalars, affs)
        got = native.g1_msm_affine(scalars, affs)
        if HC.is_infinity(OPS, want):
            assert got is None
        else:
            assert got == HC.to_affine(OPS, want)
    g = HC.to_affine(OPS, HC.G1_GENERATOR)
    assert native.g1_msm_affine([0, 0], [g, g]) is None
    assert native.g1_msm_affine([1, R - 1], [g, g]) is None  # P + (-P)
