"""Device batch-verify pipeline == host oracle (on the CPU backend)."""

import random

import pytest

pytestmark = pytest.mark.slow  # minutes of XLA-CPU compile/run per program

from lambdaworks_kzg_tpu.constants import R
from lambdaworks_kzg_tpu.models import srs
from lambdaworks_kzg_tpu.models.eip4844 import EIP4844Context, KZGError
from lambdaworks_kzg_tpu.models.kzg import HostBackend
from lambdaworks_kzg_tpu.ops.backend import DeviceBackend
from lambdaworks_kzg_tpu.utils import blob as B

N = 8  # small: the CPU-emulated subgroup checks dominate test time


@pytest.fixture(scope="module")
def ctxs():
    setup = srs.create_dev_setup(N, secret=0x777)
    return (
        EIP4844Context(setup, backend=DeviceBackend(setup)),
        EIP4844Context(setup, backend=HostBackend(setup)),
    )


def _mk(ctx, rng, count):
    blobs = [
        B.evaluations_to_blob([rng.randrange(R) for _ in range(N)])
        for _ in range(count)
    ]
    cs = [ctx.blob_to_kzg_commitment(b) for b in blobs]
    ps = [ctx.compute_blob_kzg_proof(b, c) for b, c in zip(blobs, cs)]
    return blobs, cs, ps


def test_device_batch_verify_matches_host(ctxs):
    device_ctx, host_ctx = ctxs
    rng = random.Random(1)
    blobs, cs, ps = _mk(host_ctx, rng, 2)
    assert device_ctx.verify_blob_kzg_proof_batch(blobs, cs, ps)
    assert host_ctx.verify_blob_kzg_proof_batch(blobs, cs, ps)
    # wrong proof order rejects identically
    assert not device_ctx.verify_blob_kzg_proof_batch(blobs, cs, ps[::-1])
    assert not host_ctx.verify_blob_kzg_proof_batch(blobs, cs, ps[::-1])


def test_device_batch_verify_rejections(ctxs):
    device_ctx, host_ctx = ctxs
    rng = random.Random(2)
    blobs, cs, ps = _mk(host_ctx, rng, 2)
    with pytest.raises(KZGError):
        device_ctx.verify_blob_kzg_proof_batch(
            blobs, [b"\x12" * 48, cs[1]], ps
        )
    with pytest.raises(KZGError):
        device_ctx.verify_blob_kzg_proof_batch(
            [b"\xff" * (N * 32), blobs[1]], cs, ps
        )
    with pytest.raises(KZGError):
        device_ctx.verify_blob_kzg_proof_batch(blobs, [cs[0][:47], cs[1]], ps)
