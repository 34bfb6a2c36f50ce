"""Ate pairing tests: bilinearity, non-degeneracy, batch semantics."""

from lambdaworks_kzg_tpu.host import curve as C
from lambdaworks_kzg_tpu.host import field as F
from lambdaworks_kzg_tpu.host.pairing import pairing_batch, pairings_verify

ops, ops2 = C.FP_OPS, C.FP2_OPS
G, G2 = C.G1_GENERATOR, C.G2_GENERATOR


def test_nondegenerate():
    assert pairing_batch([(G, G2)]) != F.FP12_ONE


def test_bilinearity():
    a, b = 6, 11
    e_ab = pairing_batch(
        [(C.point_scalar_mul(ops, G, a), C.point_scalar_mul(ops2, G2, b))]
    )
    e_1 = pairing_batch([(G, G2)])
    assert e_ab == F.fp12_pow(e_1, a * b)


def test_pairings_verify():
    a, b = 13, 29
    pa = C.point_scalar_mul(ops, G, a)
    qb = C.point_scalar_mul(ops2, G2, b)
    pab = C.point_scalar_mul(ops, G, a * b)
    assert pairings_verify(pab, G2, pa, qb)
    assert not pairings_verify(C.point_scalar_mul(ops, G, a * b + 1), G2, pa, qb)


def test_batch_product_semantics():
    # e(P, Q) * e(-P, Q) == 1
    gt = pairing_batch([(G, G2), (C.point_neg(ops, G), G2)])
    assert gt == F.FP12_ONE


def test_infinity_pairs_skipped():
    gt = pairing_batch([(C.infinity(ops), G2), (G, C.infinity(ops2))])
    assert gt == F.FP12_ONE
