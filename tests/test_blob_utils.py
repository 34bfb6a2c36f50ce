"""Blob codec round-trips + coefficient-form bridge consistency."""

import random

import pytest

from lambdaworks_kzg_tpu.constants import R
from lambdaworks_kzg_tpu.models import srs
from lambdaworks_kzg_tpu.models.kzg import KZG, HostBackend
from lambdaworks_kzg_tpu.utils import blob as B

N = 16


def test_roundtrip():
    rng = random.Random(1)
    evals = [rng.randrange(R) for _ in range(N)]
    blob = B.evaluations_to_blob(evals)
    assert B.blob_to_evaluations(blob, N) == evals


def test_with_size_pads():
    blob = B.evaluations_to_blob_with_size([1, 2], N)
    assert len(blob) == N * 32
    assert B.blob_to_evaluations(blob, N) == [1, 2] + [0] * (N - 2)


def test_non_canonical_rejects():
    with pytest.raises(ValueError):
        B.blob_to_evaluations(b"\xff" * (N * 32), N)


def test_coefficient_bridge_matches_evaluation():
    """p(z) computed from coefficients (Horner) equals the evaluation-form
    KZG evaluate on the same blob."""
    rng = random.Random(2)
    coeffs = [rng.randrange(R) for _ in range(N)]
    blob = B.coefficients_to_blob(coeffs, N)
    assert B.blob_to_coefficients(blob, N) == coeffs

    setup = srs.create_dev_setup(N, secret=0xAB)
    kzg = KZG(setup, backend=HostBackend(setup))
    z = rng.randrange(R)
    horner = 0
    for c in reversed(coeffs):
        horner = (horner * z + c) % R
    assert kzg.evaluate(B.blob_to_evaluations(blob, N), z) == horner
