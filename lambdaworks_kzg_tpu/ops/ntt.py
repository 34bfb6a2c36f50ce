"""Radix-2 NTT / iNTT over Fr on device (JAX/XLA, TPU-first).

The subsystem the reference declares but never builds (`FFTSettings`,
reference src/lib.rs:176-208; commented-out `new_fft_settings` /
`fft_g1` / `bit_reversal_permutation`, src/lib.rs:760-770): a vectorized
iterative Cooley-Tukey transform over the 4096-element blob domain.

Layout: Montgomery Fr limb arrays uint32[16, n] (limbs on sublanes, the
domain on vector lanes). Each stage is three batched field ops on n/2
lanes (mul by twiddle plane, add, sub) plus free reshapes — no gathers
after the initial bit-reversal permutation. Twiddle planes are
precomputed per stage and device-resident.

Semantics match host/fft.fr_fft (natural order in and out) — validated
limb-for-limb in tests/test_ntt.py. The multi-chip transform (butterfly
stages exchanged over ICI) lives in parallel/ntt.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import R, fr_root_of_unity
from ..host import fft as HFFT
from . import limbs as lb
from .field_ops import FR


class NTTPlan:
    """Precomputed device constants for one domain size n."""

    def __init__(self, n: int):
        assert n & (n - 1) == 0 and n >= 2
        self.n = n
        self.stages = n.bit_length() - 1
        # plans hold NUMPY arrays: plan creation may happen lazily inside
        # a jit/shard_map trace, and caching traced jnp constants would
        # leak tracers into later traces
        self.brp_idx = np.asarray(
            HFFT.bit_reversal_permutation(list(range(n))), dtype=np.int32
        )
        self.tw_fwd = self._twiddle_planes(inverse=False)
        self.tw_inv = self._twiddle_planes(inverse=True)
        self.n_inv_mont = FR.to_mont_host([pow(n, R - 2, R)])

    def _twiddle_planes(self, inverse: bool):
        """One [16, n/2] Montgomery twiddle plane per stage.

        Stage with block `length`: butterfly lane b = g*half + j twiddles
        by w_length^j (groups g laid out contiguously)."""
        n = self.n
        planes = []
        length = 2
        while length <= n:
            half = length // 2
            w = fr_root_of_unity(length)
            if inverse:
                w = pow(w, R - 2, R)
            tw = [1] * half
            for j in range(1, half):
                tw[j] = tw[j - 1] * w % R
            plane = tw * (n // length)
            planes.append(FR.to_mont_host(plane))
            length *= 2
        return planes


_plans = {}


def get_plan(n: int) -> NTTPlan:
    if n not in _plans:
        _plans[n] = NTTPlan(n)
    return _plans[n]


def _butterfly_stage(x: jnp.ndarray, tw: jnp.ndarray, length: int) -> jnp.ndarray:
    """One CT stage on [..., 16, n]: (e, o) -> (e + tw*o, e - tw*o)."""
    lead = x.shape[:-1]
    n = x.shape[-1]
    half = length // 2
    x4 = x.reshape(lead + (n // length, length))
    even = x4[..., :half].reshape(lead + (n // 2,))
    odd = x4[..., half:].reshape(lead + (n // 2,))
    t = FR.mul(odd, tw)
    out_e = FR.add(even, t).reshape(lead + (n // length, half))
    out_o = FR.sub(even, t).reshape(lead + (n // length, half))
    return jnp.concatenate([out_e, out_o], axis=-1).reshape(lead + (n,))


@functools.partial(jax.jit, static_argnames=("n", "inverse", "scale"))
def _ntt_mont(
    x_mont, brp_idx, tw_planes, n_inv_mont, n: int, inverse: bool,
    scale: bool = True,
):
    """Natural-order NTT on Montgomery limbs [..., 16, n]."""
    x = jnp.take(x_mont, brp_idx, axis=-1)
    length = 2
    for tw in tw_planes:
        x = _butterfly_stage(x, tw, length)
        length *= 2
    if inverse and scale:
        x = FR.mul(x, jnp.broadcast_to(n_inv_mont, x.shape))
    return x


def ntt_device(
    x_mont: jnp.ndarray, inverse: bool = False, scale: bool = True
) -> jnp.ndarray:
    """Montgomery [..., 16, n] -> same shape, natural order in/out on the
    last axis (same semantics as host/fft.fr_fft). `scale=False` skips the
    1/n factor of the inverse transform (the 4-step multichip transform
    applies it once globally)."""
    n = x_mont.shape[-1]
    plan = get_plan(n)
    tw = plan.tw_inv if inverse else plan.tw_fwd
    return _ntt_mont(
        x_mont, plan.brp_idx, tuple(tw), plan.n_inv_mont, n, inverse, scale
    )


def ntt_ints(values, inverse: bool = False):
    """Host ints -> host ints (convenience/oracle-compat wrapper)."""
    x = jnp.asarray(FR.to_mont_host([v % R for v in values]))
    y = ntt_device(x, inverse=inverse)
    return FR.from_mont_host(np.asarray(y))
