"""Vectorized blob codec vs. the per-int oracle path."""

import secrets

import numpy as np
import pytest

from lambdaworks_kzg_tpu.constants import R
from lambdaworks_kzg_tpu.ops import codec, limbs as lb
from lambdaworks_kzg_tpu.utils import hashing as H

N = 64


def _rand_blob(n=N):
    return b"".join(secrets.token_bytes(31) + b"\x00" for _ in range(n))


def test_blob_to_limbs_matches_int_oracle():
    blob = _rand_blob()
    limbs = codec.blob_to_limbs(blob, N)
    expected = [H.bytes_to_bls_field(blob[i * 32 : (i + 1) * 32]) for i in range(N)]
    assert lb.limbs_to_ints(limbs) == expected


def test_blob_to_limbs_rejects_non_canonical():
    bad = _rand_blob()[:-32] + b"\xff" * 32
    with pytest.raises(ValueError):
        codec.blob_to_limbs(bad, N)
    # exactly r must also reject
    r_le = R.to_bytes(32, "little")
    with pytest.raises(ValueError):
        codec.blob_to_limbs(_rand_blob()[:-32] + r_le, N)
    # r - 1 is canonical
    ok = _rand_blob()[:-32] + (R - 1).to_bytes(32, "little")
    limbs = codec.blob_to_limbs(ok, N)
    assert lb.limbs_to_ints(limbs)[-1] == R - 1


def test_blob_to_limbs_rejects_bad_size():
    with pytest.raises(ValueError):
        codec.blob_to_limbs(b"\x00" * 31, N)
