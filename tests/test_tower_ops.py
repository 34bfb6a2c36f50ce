"""Device Fp6/Fp12 tower vs the host oracle (limb-exact).

Mirrors the reference's tower types (lambdaworks Degree6/Degree12
extension fields, reached through BLS12381AtePairing at reference
src/utils.rs:224) — here gated against host/field.py.
"""

import random

import numpy as np
import pytest

from lambdaworks_kzg_tpu.constants import P
from lambdaworks_kzg_tpu.host import field as HF
from lambdaworks_kzg_tpu.ops import tower_ops as T

rng = random.Random(0xF12)


def _rfp2():
    return (rng.randrange(P), rng.randrange(P))


def _rfp6():
    return (_rfp2(), _rfp2(), _rfp2())


def _rfp12():
    return (_rfp6(), _rfp6())


@pytest.fixture(scope="module")
def batch():
    a = [_rfp12() for _ in range(4)]
    b = [_rfp12() for _ in range(4)]
    return a, b, T.fp12_from_host(a), T.fp12_from_host(b)


def test_fp6_mul_inv(batch):
    a6 = [_rfp6() for _ in range(4)]
    b6 = [_rfp6() for _ in range(4)]
    da, db = T.fp6_from_host(a6), T.fp6_from_host(b6)
    assert T.fp6_to_host(T.fp6_mul(da, db)) == [
        HF.fp6_mul(x, y) for x, y in zip(a6, b6)
    ]
    assert T.fp6_to_host(T.fp6_inv(da)) == [HF.fp6_inv(x) for x in a6]


def test_fp12_mul_sqr(batch):
    a, b, da, db = batch
    assert T.fp12_to_host(T.fp12_mul(da, db)) == [
        HF.fp12_mul(x, y) for x, y in zip(a, b)
    ]
    assert T.fp12_to_host(T.fp12_sqr(da)) == [HF.fp12_sqr(x) for x in a]


def test_fp12_inv_conj(batch):
    a, _, da, _ = batch
    assert T.fp12_to_host(T.fp12_inv(da)) == [HF.fp12_inv(x) for x in a]
    assert T.fp12_to_host(T.fp12_conj(da)) == [HF.fp12_conj(x) for x in a]


def test_fp12_frobenius(batch):
    a, _, da, _ = batch
    assert T.fp12_to_host(T.fp12_frobenius(da)) == [
        HF.fp12_frobenius(x) for x in a
    ]
    assert T.fp12_to_host(T.fp12_frobenius_n(da, 2)) == [
        HF.fp12_frobenius_n(x, 2) for x in a
    ]
    assert T.fp12_to_host(T.fp12_frobenius_n(da, 3)) == [
        HF.fp12_frobenius_n(x, 3) for x in a
    ]


def test_fp12_eq_one():
    vals = [HF.FP12_ONE, _rfp12(), HF.FP12_ONE, _rfp12()]
    got = np.asarray(T.fp12_eq_one(T.fp12_from_host(vals)))
    assert got.tolist() == [True, False, True, False]


def test_fp12_cyc_sqr_on_cyclotomic():
    """Granger-Scott squaring == generic squaring on cyclotomic
    elements (the only domain it is used on: post-easy-part)."""
    vals = [_rfp12() for _ in range(3)]
    cyc = [
        HF.fp12_mul(
            HF.fp12_frobenius_n(
                HF.fp12_mul(HF.fp12_conj(v), HF.fp12_inv(v)), 2
            ),
            HF.fp12_mul(HF.fp12_conj(v), HF.fp12_inv(v)),
        )
        for v in vals
    ]
    d = T.fp12_from_host(cyc)
    assert T.fp12_to_host(T.fp12_cyc_sqr(d)) == [HF.fp12_sqr(m) for m in cyc]
