"""Multi-chip 4-step NTT vs the host oracle, on the virtual CPU mesh."""

import random

import jax
import pytest

pytestmark = pytest.mark.slow  # minutes of XLA-CPU compile/run per program

from lambdaworks_kzg_tpu.constants import R
from lambdaworks_kzg_tpu.host import fft as HFFT
from lambdaworks_kzg_tpu.parallel import make_mesh
from lambdaworks_kzg_tpu.parallel.ntt import sharded_ntt_ints

N = 64


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(devices=jax.devices()[:4], data=1)  # points axis = 4


def test_sharded_ntt_matches_host(mesh):
    rng = random.Random(21)
    values = [rng.randrange(R) for _ in range(N)]
    got = sharded_ntt_ints(mesh, "points", values)
    assert got == HFFT.fr_fft(values)


def test_sharded_intt_matches_host(mesh):
    rng = random.Random(22)
    values = [rng.randrange(R) for _ in range(N)]
    got = sharded_ntt_ints(mesh, "points", values, inverse=True)
    assert got == HFFT.fr_fft(values, inverse=True)


def test_sharded_roundtrip(mesh):
    rng = random.Random(23)
    values = [rng.randrange(R) for _ in range(N)]
    fwd = sharded_ntt_ints(mesh, "points", values)
    back = sharded_ntt_ints(mesh, "points", fwd, inverse=True)
    assert back == [v % R for v in values]
