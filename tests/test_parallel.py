"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

SURVEY.md §4 "multi-node testing": single-chip vs multi-chip equivalence
(same bits out) without real TPU hardware. conftest.py forces
XLA_FORCE_HOST_PLATFORM_DEVICE_COUNT=8. All tests share one (mesh, c)
config so the sharded step compiles once per kind.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # minutes of XLA-CPU compile/run per program

from lambdaworks_kzg_tpu.constants import R
from lambdaworks_kzg_tpu.host import curve as HC
from lambdaworks_kzg_tpu.models import srs
from lambdaworks_kzg_tpu.ops import g1_ops, msm as msm1
from lambdaworks_kzg_tpu.parallel import batch_msm, make_mesh, sharded_msm

N = 64
C_BITS = 3


@pytest.fixture(scope="module")
def dev_setup():
    return srs.create_dev_setup(N, secret=0xDEADBEEFCAFE)


@pytest.fixture(scope="module")
def device_points(dev_setup):
    return g1_ops.make_points_host(dev_setup.g1_lagrange_brp)


@pytest.fixture(scope="module")
def mesh():
    # 2x2: exercises both axes while keeping CPU-emulation cost low
    return make_mesh(devices=jax.devices()[:4])


def _rand_scalars(n, rng):
    return [rng.randrange(R) for _ in range(n)]


def test_mesh_shapes():
    m = make_mesh()
    assert m.devices.size == len(jax.devices())
    assert m.axis_names == ("data", "points")
    m2 = make_mesh(points=4)
    assert m2.devices.shape == (len(jax.devices()) // 4, 4)


def test_sharded_msm_matches_host_oracle(dev_setup, device_points, mesh):
    rng = random.Random(8)
    points, valid = device_points
    scalars_ints = _rand_scalars(N, rng)
    expected = HC.g1_msm(scalars_ints, dev_setup.g1_lagrange_brp)
    got = sharded_msm(
        mesh, points, valid, msm1.scalars_to_device(scalars_ints),
        c=C_BITS, shard="points",
    )
    assert HC.points_eq(HC.FP_OPS, got, expected)


def test_sharded_msm_edge_lanes(dev_setup, device_points, mesh):
    """Zero scalars + per-shard empty buckets (reuses the compiled step)."""
    points, valid = device_points
    scalars_ints = [0] * (N - 2) + [1, 2]
    expected = HC.g1_msm(scalars_ints, dev_setup.g1_lagrange_brp)
    got = sharded_msm(
        mesh, points, valid, msm1.scalars_to_device(scalars_ints),
        c=C_BITS, shard="points",
    )
    assert HC.points_eq(HC.FP_OPS, got, expected)


def test_window_sharded_msm_matches_host_oracle(
    dev_setup, device_points, mesh
):
    """shard="windows": each device owns ceil(W/D) Pippenger windows of
    the FULL point set (the no-skew mode for protocol-size commits);
    bits must match the host oracle, including the alias-split top
    window landing on a non-final shard position."""
    rng = random.Random(11)
    points, valid = device_points
    scalars_ints = _rand_scalars(N, rng)
    expected = HC.g1_msm(scalars_ints, dev_setup.g1_lagrange_brp)
    got = sharded_msm(
        mesh, points, valid, msm1.scalars_to_device(scalars_ints),
        c=C_BITS, shard="windows",
    )
    assert HC.points_eq(HC.FP_OPS, got, expected)


def test_batch_msm_data_parallel(dev_setup, device_points, mesh):
    rng = random.Random(9)
    points, valid = device_points
    batch = 2
    scalar_lists = [_rand_scalars(N, rng) for _ in range(batch)]
    scalars_batch = jnp.asarray(
        np.stack([np.asarray(msm1.scalars_to_device(s)) for s in scalar_lists])
    )
    got = batch_msm(mesh, points, valid, scalars_batch, c=C_BITS)
    for s_ints, pt in zip(scalar_lists, got):
        expected = HC.g1_msm(s_ints, dev_setup.g1_lagrange_brp)
        assert HC.points_eq(HC.FP_OPS, pt, expected)


def test_dev_setup_commit_roundtrip(dev_setup):
    """create_dev_setup is protocol-consistent: commit/open/verify works."""
    from lambdaworks_kzg_tpu.models.kzg import KZG, HostBackend

    kzg = KZG(dev_setup, backend=HostBackend(dev_setup))
    rng = random.Random(10)
    evals = [rng.randrange(R) for _ in range(N)]
    commitment = kzg.commit(evals)
    z = rng.randrange(R)
    proof, y = kzg.open(evals, z)
    assert kzg.verify(commitment, z, y, proof)
    assert not kzg.verify(commitment, z, (y + 1) % R, proof)
