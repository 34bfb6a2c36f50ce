"""Point-op dispatch: fused Mosaic kernels on TPU, XLA tier elsewhere.

LWKZG_PALLAS=1/0 overrides (1 uses Pallas interpret mode off-TPU: exact
but slow — for differential testing only).
"""

import os

import jax

from . import g1_ops as g1


def use_pallas() -> bool:
    env = os.environ.get("LWKZG_PALLAS")
    if env is not None:
        return env != "0"
    return jax.default_backend() == "tpu"


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def madd(p, q_aff, q_valid):
    if use_pallas():
        from . import pallas_g1

        return pallas_g1.madd(p, q_aff, q_valid, interpret=_interp())
    return g1.madd(p, q_aff, q_valid)


def add(p, q):
    if use_pallas():
        from . import pallas_g1

        return pallas_g1.add(p, q, interpret=_interp())
    return g1.add(p, q)


def dbl(p):
    if use_pallas():
        from . import pallas_g1

        return pallas_g1.dbl(p, interpret=_interp())
    return g1.dbl(p)
