"""Point-op dispatch: fused Mosaic kernels on TPU, XLA tier elsewhere.

LWKZG_PALLAS=1/0 overrides (1 uses Pallas interpret mode off-TPU: exact
but slow — for differential testing only).

Lane-count canonicalization: each distinct Pallas lane shape costs a
~45 s Mosaic compile on TPU (measured; the round-1 fold-reduce
instantiated ~14 add shapes — a 10-minute cold start by itself). The
wrappers pad the lane axis to the next power of two (min 512) so every
call site shares a small bounded set of compiled kernels; pad lanes are
infinity/dead and are sliced off the result.
"""

import os

import jax
import jax.numpy as jnp

from . import g1_ops as g1

_MIN_LANES = 512


def use_pallas() -> bool:
    env = os.environ.get("LWKZG_PALLAS")
    if env is not None:
        return env != "0"
    return jax.default_backend() == "tpu"


def _kernels():
    """Kernel module: v2 (limbs on the leading, vreg-granular axis) by
    default — measured ~10-25% faster per Fp mul on v5e than the v1
    sublane-limb layout at identical bit behavior. LWKZG_KERNEL=v1
    selects the old layout."""
    if os.environ.get("LWKZG_KERNEL") == "v1":
        from . import pallas_g1

        return pallas_g1
    from . import pallas_g1_v2

    return pallas_g1_v2


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def _canon(m: int) -> int:
    t = _MIN_LANES
    while t < m:
        t *= 2
    return t


def _pad(arr, m_to):
    m = arr.shape[-1]
    if m == m_to:
        return arr
    pad = [(0, 0)] * (arr.ndim - 1) + [(0, m_to - m)]
    return jnp.pad(arr, pad)


def madd(p, q_aff, q_valid):
    if use_pallas():
        k = _kernels()
        m = p.shape[-1]
        t = _canon(m)
        out = k.madd(
            _pad(p, t), _pad(q_aff, t), _pad(q_valid, t), interpret=_interp()
        )
        return out[..., :m]
    return g1.madd(p, q_aff, q_valid)


def add(p, q):
    if use_pallas():
        k = _kernels()
        m = p.shape[-1]
        t = _canon(m)
        out = k.add(_pad(p, t), _pad(q, t), interpret=_interp())
        return out[..., :m]
    return g1.add(p, q)


def dbl(p):
    if use_pallas():
        k = _kernels()
        m = p.shape[-1]
        t = _canon(m)
        return k.dbl(_pad(p, t), interpret=_interp())[..., :m]
    return g1.dbl(p)
