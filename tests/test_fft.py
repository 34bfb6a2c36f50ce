"""NTT / group-FFT / barycentric oracle tests."""

import random

from lambdaworks_kzg_tpu.constants import R, fr_root_of_unity
from lambdaworks_kzg_tpu.host import curve as C
from lambdaworks_kzg_tpu.host import fft as FFT

random.seed(7)
ops = C.FP_OPS


def test_brp_involution():
    vals = list(range(16))
    assert FFT.bit_reversal_permutation(
        FFT.bit_reversal_permutation(vals)
    ) == vals


def test_fr_fft_matches_naive_dft():
    n = 16
    vals = [random.randrange(R) for _ in range(n)]
    w = fr_root_of_unity(n)
    naive = [
        sum(vals[j] * pow(w, i * j, R) for j in range(n)) % R for i in range(n)
    ]
    assert FFT.fr_fft(vals) == naive


def test_fr_fft_roundtrip():
    vals = [random.randrange(R) for _ in range(64)]
    assert FFT.fr_fft(FFT.fr_fft(vals), inverse=True) == vals


def test_g1_fft_linearity_with_scalar_fft():
    # group FFT of [c_i]G must equal [FFT(c)_i]G
    n = 8
    coeffs = [random.randrange(R) for _ in range(n)]
    pts = [C.point_scalar_mul(ops, C.G1_GENERATOR, c) for c in coeffs]
    out = FFT.g1_fft(pts, inverse=True)
    expect = FFT.fr_fft(coeffs, inverse=True)
    for pt, e in zip(out, expect):
        assert C.points_eq(
            ops, pt, C.point_scalar_mul(ops, C.G1_GENERATOR, e)
        )


def test_barycentric_matches_coefficient_eval():
    n = 32
    coeffs = [random.randrange(R) for _ in range(n)]
    evals_nat = FFT.fr_fft(coeffs)  # natural-order evaluations
    evals_brp = FFT.bit_reversal_permutation(evals_nat)
    z = random.randrange(R)
    expect = 0
    for c in reversed(coeffs):
        expect = (expect * z + c) % R
    assert FFT.barycentric_evaluate(evals_brp, z, n) == expect


def test_barycentric_in_domain():
    n = 8
    evals_brp = [random.randrange(R) for _ in range(n)]
    roots_brp = FFT.bit_reversal_permutation(FFT.fr_roots_of_unity(n))
    for i in (0, 3, 7):
        assert FFT.barycentric_evaluate(evals_brp, roots_brp[i], n) == evals_brp[i]
