"""Multi-chip mesh reachable from the PUBLIC API, bit-identical outputs.

The reference runs everything single-threaded (batch loop at
src/lib.rs:562-596); here `EIP4844Context(..., mesh=...)` /
`DeviceBackend(setup, mesh=...)` runs every MSM sharded over a
(data, points) jax Mesh. These tests pin the product contract: the
7-function surface produces byte-identical results on mesh shapes
(1, 1), (2, 4) and (1, 8) — at the real 4096-point protocol shape for
the commitment path — and the generic lincomb MSM (batch verify) pads
correctly to the points axis.
"""

import os
import random

import pytest

# The 4096-shape mesh programs cost minutes of XLA-CPU compile+run per
# mesh shape on a small CI box; by default one mesh shape runs at the
# real protocol shape and the rest at a dev-setup shape.
# LWKZG_FULL_VECTOR_GATE=1 (set in CI) runs the full matrix.
_FULL = os.environ.get("LWKZG_FULL_VECTOR_GATE") == "1"


from lambdaworks_kzg_tpu.constants import R
from lambdaworks_kzg_tpu.models import srs
from lambdaworks_kzg_tpu.models.eip4844 import EIP4844Context
from lambdaworks_kzg_tpu.models.kzg import HostBackend
from lambdaworks_kzg_tpu.ops.backend import DeviceBackend
from lambdaworks_kzg_tpu.parallel.mesh import make_mesh
from lambdaworks_kzg_tpu.utils import blob as B

MESH_SHAPES = [(1, 1), (2, 4), (1, 8)] if _FULL else [(2, 4)]


def _rand_blob(n, rng):
    return B.evaluations_to_blob([rng.randrange(R) for _ in range(n)])


@pytest.fixture(scope="module")
def blob4096():
    return _rand_blob(4096, random.Random(0xB10B))


@pytest.fixture(scope="module")
def commitment_nomesh(mainnet_setup, blob4096):
    ctx = EIP4844Context(mainnet_setup, backend=DeviceBackend(mainnet_setup))
    return ctx.blob_to_kzg_commitment(blob4096)


@pytest.mark.slow
@pytest.mark.parametrize("shape", MESH_SHAPES)
def test_commitment_bit_identical_across_meshes(
    mainnet_setup, blob4096, commitment_nomesh, shape
):
    mesh = make_mesh(data=shape[0], points=shape[1])
    ctx = EIP4844Context(
        mainnet_setup, backend=DeviceBackend(mainnet_setup, mesh=mesh)
    )
    assert ctx.blob_to_kzg_commitment(blob4096) == commitment_nomesh


@pytest.mark.slow
@pytest.mark.parametrize(
    "shape", [(1, 1), (2, 4), (1, 8)] if not _FULL else [(2, 4)]
)
def test_full_surface_on_mesh_small_setup(shape):
    """All 7 entry points on a mesh == host oracle (dev setup); covers
    the mesh-shape matrix cheaply (the 4096-shape matrix runs under
    LWKZG_FULL_VECTOR_GATE=1)."""
    setup = srs.create_dev_setup(256, secret=0xABCD)
    mesh = make_mesh(data=shape[0], points=shape[1])
    ctx = EIP4844Context(setup, backend=DeviceBackend(setup, mesh=mesh))
    host = EIP4844Context(setup, backend=HostBackend(setup))
    rng = random.Random(7)
    blobs = [_rand_blob(256, rng) for _ in range(3)]

    cs = [ctx.blob_to_kzg_commitment(b) for b in blobs]
    assert cs == [host.blob_to_kzg_commitment(b) for b in blobs]

    from lambdaworks_kzg_tpu.utils.hashing import bls_field_to_bytes

    z_bytes = bls_field_to_bytes(rng.randrange(R))
    proof, y = ctx.compute_kzg_proof(blobs[0], z_bytes)
    assert (proof, y) == host.compute_kzg_proof(blobs[0], z_bytes)
    assert ctx.verify_kzg_proof(cs[0], z_bytes, y, proof)

    bps = [ctx.compute_blob_kzg_proof(b, c) for b, c in zip(blobs, cs)]
    assert bps == [
        host.compute_blob_kzg_proof(b, c) for b, c in zip(blobs, cs)
    ]
    assert ctx.verify_blob_kzg_proof(blobs[0], cs[0], bps[0])
    # batch verify: odd batch size (3) exercises both the data-axis pad
    # and the generic MSM's points-axis pad
    assert ctx.verify_blob_kzg_proof_batch(blobs, cs, bps)
    assert not ctx.verify_blob_kzg_proof_batch(blobs, cs, bps[::-1])


@pytest.mark.slow
@pytest.mark.skipif(
    not _FULL,
    reason="4096-shape batched mesh run (LWKZG_FULL_VECTOR_GATE=1 runs it)",
)
def test_batched_apis_on_mesh(mainnet_setup, blob4096, commitment_nomesh):
    """commit/prove batch APIs shard over `data` (batch not divisible by
    the axis -> padded) and agree with the single-chip result."""
    mesh = make_mesh(data=2, points=4)
    ctx = EIP4844Context(
        mainnet_setup, backend=DeviceBackend(mainnet_setup, mesh=mesh)
    )
    rng = random.Random(3)
    blobs = [blob4096, _rand_blob(4096, rng), _rand_blob(4096, rng)]
    cs = ctx.blob_to_kzg_commitment_batch(blobs)
    assert cs[0] == commitment_nomesh
    ps = ctx.compute_blob_kzg_proof_batch(blobs, cs)
    assert ctx.verify_blob_kzg_proof_batch(blobs, cs, ps)


def test_config_mesh_shape_reaches_backend(monkeypatch):
    """LWKZG_MESH_SHAPE / KZGConfig.mesh_shape construct a meshed backend."""
    from lambdaworks_kzg_tpu.utils.config import KZGConfig

    monkeypatch.setenv("LWKZG_MESH_SHAPE", "2x4")
    cfg = KZGConfig.from_env()
    assert cfg.mesh_shape == (2, 4)
    setup = srs.create_dev_setup(64, secret=0x11)
    backend = cfg.make_backend(setup)
    assert isinstance(backend, DeviceBackend)
    assert backend.mesh is not None
    assert dict(zip(backend.mesh.axis_names, backend.mesh.devices.shape)) == {
        "data": 2,
        "points": 4,
    }
