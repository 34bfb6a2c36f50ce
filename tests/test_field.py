"""Host field-tower unit tests (oracle tier)."""

import random

from lambdaworks_kzg_tpu.constants import P, R
from lambdaworks_kzg_tpu.host import field as F

random.seed(1234)


def rand_fp2():
    return (random.randrange(P), random.randrange(P))


def rand_fp6():
    return tuple(rand_fp2() for _ in range(3))


def rand_fp12():
    return (rand_fp6(), rand_fp6())


def test_fp2_mul_inv_roundtrip():
    for _ in range(20):
        a = rand_fp2()
        assert F.fp2_mul(a, F.fp2_inv(a)) == F.FP2_ONE


def test_fp2_sqrt_roundtrip():
    for _ in range(20):
        a = rand_fp2()
        sq = F.fp2_sqr(a)
        s = F.fp2_sqrt(sq)
        assert s is not None and (s == a or s == F.fp2_neg(a))


def test_fp2_sqrt_nonresidue_rejected():
    # multiply a square by a non-residue; sqrt must fail
    a = F.fp2_sqr(rand_fp2())
    nr = (1, 1)  # xi = 1+u is a non-residue in Fp2
    assert F.fp2_sqrt(F.fp2_mul(a, nr)) is None


def test_fp6_fp12_inverse():
    a6 = rand_fp6()
    assert F.fp6_mul(a6, F.fp6_inv(a6)) == F.FP6_ONE
    a12 = rand_fp12()
    assert F.fp12_mul(a12, F.fp12_inv(a12)) == F.FP12_ONE


def test_fp12_mul_associative_distributive():
    a, b, c = rand_fp12(), rand_fp12(), rand_fp12()
    assert F.fp12_mul(F.fp12_mul(a, b), c) == F.fp12_mul(a, F.fp12_mul(b, c))
    assert F.fp12_mul(a, F.fp12_add(b, c)) == F.fp12_add(
        F.fp12_mul(a, b), F.fp12_mul(a, c)
    )


def test_fp12_frobenius_is_pth_power():
    a = rand_fp12()
    assert F.fp12_frobenius(a) == F.fp12_pow(a, P)


def test_fp12_sqr_matches_mul():
    a = rand_fp12()
    assert F.fp12_sqr(a) == F.fp12_mul(a, a)


def test_batch_fr_inv():
    vals = [random.randrange(1, R) for _ in range(17)] + [0]
    out = F.batch_fr_inv(vals)
    for v, i in zip(vals, out):
        if v == 0:
            assert i == 0
        else:
            assert v * i % R == 1
