"""Protocol round-trip tests on a dev SRS (known toxic waste).

Behavioral parity with the reference integration tests
(reference tests/lib_test.rs:19-260): simple-poly known answers and a
two-blob batch round trip, plus validation edge cases.
"""

import random

import pytest

from lambdaworks_kzg_tpu.constants import BYTES_PER_FIELD_ELEMENT, R
from lambdaworks_kzg_tpu.host import curve as C
from lambdaworks_kzg_tpu.host import fft as FFT
from lambdaworks_kzg_tpu.models.eip4844 import EIP4844Context, KZGError
from lambdaworks_kzg_tpu.models.kzg import KZG, HostBackend
from lambdaworks_kzg_tpu.models.srs import TrustedSetup
from lambdaworks_kzg_tpu.utils import hashing as H

ops, ops2 = C.FP_OPS, C.FP2_OPS
random.seed(42)

N = 8
SECRET = 0xDEADBEEF12345678_90ABCDEF


def make_dev_setup(n=N, s=SECRET) -> TrustedSetup:
    """Dev SRS with known toxic waste (parity: reference utils.rs:84-107)."""
    g1_mono = [
        C.to_affine(ops, C.point_scalar_mul(ops, C.G1_GENERATOR, pow(s, i, R)))
        for i in range(n)
    ]
    g2_mono = [
        C.to_affine(
            ops2, C.point_scalar_mul(ops2, C.G2_GENERATOR, pow(s, i, R))
        )
        for i in range(2)
    ]
    mono_jac = [C.from_affine(ops, a) for a in g1_mono]
    lag = FFT.bit_reversal_permutation(FFT.g1_fft(mono_jac, inverse=True))
    return TrustedSetup(
        g1_lagrange_brp=[C.to_affine(ops, p) for p in lag],
        g1_monomial=g1_mono,
        g2_monomial=g2_mono,
        source_digest="dev",
    )


@pytest.fixture(scope="module")
def dev_setup():
    return make_dev_setup()


@pytest.fixture(scope="module")
def kzg(dev_setup):
    return KZG(dev_setup, backend=HostBackend(dev_setup))


@pytest.fixture(scope="module")
def ctx(dev_setup):
    return EIP4844Context(dev_setup, backend=HostBackend(dev_setup))


def blob_from_ints(vals):
    return b"".join(v.to_bytes(BYTES_PER_FIELD_ELEMENT, "little") for v in vals)


def test_constant_poly_proof_is_infinity(kzg):
    # p(x) = 1 everywhere => quotient 0 => proof = infinity
    # (parity: reference lib_test.rs:19-87 "simple poly" expectations)
    evals = [1] * N
    commitment = kzg.commit(evals)
    proof, y = kzg.open(evals, 12345)
    assert y == 1
    assert C.is_infinity(ops, proof)
    assert kzg.verify(commitment, 12345, y, proof)


def test_commitment_of_constant_is_generator_multiple(kzg):
    # sum of lagrange basis == 1 => commit([c..c]) == [c]G
    evals = [7] * N
    commitment = kzg.commit(evals)
    assert C.points_eq(
        ops, commitment, C.point_scalar_mul(ops, C.G1_GENERATOR, 7)
    )


def test_linear_poly_known_answer(kzg, dev_setup):
    # p(x) = x in evaluation form: evals are the domain points themselves.
    # commitment must equal [s]G = g1_monomial[1]; proof == G for any z
    # (parity: reference lib_test.rs:89-167 expectations)
    roots_brp = FFT.bit_reversal_permutation(FFT.fr_roots_of_unity(N))
    commitment = kzg.commit(roots_brp)
    assert C.points_eq(
        ops, commitment, C.from_affine(ops, dev_setup.g1_monomial[1])
    )
    z = 2
    proof, y = kzg.open(roots_brp, z)
    assert y == 2
    # q(x) = (x - z)/(x - z) = 1 => proof = [1 * sum lagrange]G = G
    assert C.points_eq(ops, proof, C.G1_GENERATOR)
    assert kzg.verify(commitment, z, y, proof)


def test_end_to_end_random_blobs(ctx):
    blobs = [
        blob_from_ints([random.randrange(R) for _ in range(N)])
        for _ in range(2)
    ]
    commitments = [ctx.blob_to_kzg_commitment(b) for b in blobs]
    proofs = [
        ctx.compute_blob_kzg_proof(b, c) for b, c in zip(blobs, commitments)
    ]
    for b, c, p in zip(blobs, commitments, proofs):
        assert ctx.verify_blob_kzg_proof(b, c, p)
    # batch (parity: reference lib_test.rs:169-260)
    assert ctx.verify_blob_kzg_proof_batch(blobs, commitments, proofs)
    # tampered proof fails
    assert not ctx.verify_blob_kzg_proof(blobs[0], commitments[0], proofs[1])
    assert not ctx.verify_blob_kzg_proof_batch(
        blobs, commitments, list(reversed(proofs))
    )


def test_compute_kzg_proof_roundtrip(ctx):
    blob = blob_from_ints([random.randrange(R) for _ in range(N)])
    z_bytes = (98765).to_bytes(32, "little")
    proof, y = ctx.compute_kzg_proof(blob, z_bytes)
    commitment = ctx.blob_to_kzg_commitment(blob)
    assert ctx.verify_kzg_proof(commitment, z_bytes, y, proof)
    bad_y = ((int.from_bytes(y, "little") + 1) % R).to_bytes(32, "little")
    assert not ctx.verify_kzg_proof(commitment, z_bytes, bad_y, proof)


def test_invalid_blob_rejected(ctx):
    bad = blob_from_ints([R] + [0] * (N - 1))  # non-canonical
    with pytest.raises(KZGError):
        ctx.blob_to_kzg_commitment(bad)
    with pytest.raises(KZGError):
        ctx.blob_to_kzg_commitment(b"\0" * 7)  # wrong size


def test_empty_batch_is_true(ctx):
    # spec semantics (documented deviation from reference lib.rs:537-543)
    assert ctx.verify_blob_kzg_proof_batch([], [], [])


def test_batch_length_mismatch_rejected(ctx):
    blob = blob_from_ints([0] * N)
    c = ctx.blob_to_kzg_commitment(blob)
    with pytest.raises(KZGError):
        ctx.verify_blob_kzg_proof_batch([blob], [c], [])


def test_challenge_determinism():
    blob = b"\x01" + bytes(131071)
    c = bytes([0xC0]) + bytes(47)
    assert H.compute_challenge(blob, c) == H.compute_challenge(blob, c)
    assert H.compute_challenge(blob, c) < R
