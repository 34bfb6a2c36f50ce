"""Device NTT vs the host-exact oracle (host/fft.fr_fft)."""

import random

import pytest

from lambdaworks_kzg_tpu.constants import R
from lambdaworks_kzg_tpu.host import fft as HFFT
from lambdaworks_kzg_tpu.ops import ntt


@pytest.mark.parametrize("n", [8, 64, 256])
def test_ntt_matches_host(n):
    rng = random.Random(n)
    values = [rng.randrange(R) for _ in range(n)]
    assert ntt.ntt_ints(values) == HFFT.fr_fft(values)


@pytest.mark.parametrize("n", [8, 256])
def test_intt_matches_host(n):
    rng = random.Random(100 + n)
    values = [rng.randrange(R) for _ in range(n)]
    assert ntt.ntt_ints(values, inverse=True) == HFFT.fr_fft(values, inverse=True)


def test_ntt_roundtrip():
    rng = random.Random(7)
    values = [rng.randrange(R) for _ in range(64)]
    assert ntt.ntt_ints(ntt.ntt_ints(values), inverse=True) == [
        v % R for v in values
    ]


def test_ntt_convolution_property():
    """NTT(f)*NTT(g) pointwise == NTT(f*g mod (x^n - 1))."""
    n = 32
    rng = random.Random(11)
    f = [rng.randrange(R) for _ in range(n)]
    g = [rng.randrange(R) for _ in range(n)]
    conv = [0] * n
    for i in range(n):
        for j in range(n):
            conv[(i + j) % n] = (conv[(i + j) % n] + f[i] * g[j]) % R
    lhs = [a * b % R for a, b in zip(ntt.ntt_ints(f), ntt.ntt_ints(g))]
    assert lhs == ntt.ntt_ints(conv)
