"""Differential test of the fused Mosaic point kernels (interpret mode).

The Pallas kernels (ops/pallas_g1_v2) are the production TPU tier behind
every MSM madd/add/dbl; on-chip they are gated end-to-end by the
consensus vectors, but kernel-arithmetic edits need a direct CPU gate
too: this runs the kernels in Pallas INTERPRET mode (bit-exact, slow)
against the XLA tier (ops/g1_ops) — same formulas module, so outputs
must match BIT-FOR-BIT, not just projectively.

Covers the special lanes the madd kernel handles with selects:
P = infinity, live = False, P == Q (doubling fixup), P == -Q (to
infinity). One 128-lane block keeps interpret-mode cost down.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode limb arithmetic is slow

from lambdaworks_kzg_tpu.host import curve as HC
from lambdaworks_kzg_tpu.models import srs
from lambdaworks_kzg_tpu.ops import g1_ops, pallas_g1_v2 as K
from lambdaworks_kzg_tpu.ops.field_ops import FP

M = 128


def _lift(points, valid):
    """[2, L, M] affine + valid -> [3, L, M] Jacobian (Z = 1 or 0)."""
    l, m = points.shape[1], points.shape[2]
    one = jnp.broadcast_to(FP.ONE_limbs, (l, m)).astype(jnp.uint32)
    z = jnp.where(jnp.asarray(valid)[None, :], one, 0)
    return jnp.stack([points[0], points[1], z], axis=0)


def _lanes():
    setup = srs.create_dev_setup(64, secret=0xFA11)
    base = setup.g1_lagrange_brp
    rng = random.Random(7)
    p_aff, q_aff, q_valid = [], [], []
    for i in range(M):
        a = base[rng.randrange(64)]
        b = base[rng.randrange(64)]
        if i % 16 == 3:
            a = None  # P at infinity: madd must lift Q
        if i % 16 == 7 and a is not None:
            b = a  # P == Q: doubling fixup lane
        if i % 16 == 11 and a is not None:
            b = (a[0], (-a[1]) % HC.P)  # P == -Q: to-infinity lane
        q_valid.append(i % 16 != 13)  # dead lane: P must pass through
        p_aff.append(a)
        q_aff.append(b)
    p2, p_valid = g1_ops.make_points_host(p_aff)
    q2, _ = g1_ops.make_points_host(q_aff)
    return _lift(p2, p_valid), q2, jnp.asarray(np.asarray(q_valid))


def test_madd_add_dbl_interpret_match_xla_tier():
    p, q, q_valid = _lanes()

    got = K.madd(p, q, q_valid, interpret=True)
    want = g1_ops.madd(p, q, q_valid)
    assert np.array_equal(np.asarray(got), np.asarray(want))

    q3 = _lift(q, q_valid)
    got = K.add(p, q3, interpret=True)
    want = g1_ops.add(p, q3)
    assert np.array_equal(np.asarray(got), np.asarray(want))

    got = K.dbl(p, interpret=True)
    want = g1_ops.dbl(p)
    assert np.array_equal(np.asarray(got), np.asarray(want))
