"""Consensus-spec-tests vector runner — the primary bit-exactness gate.

The reference ships 208 YAML vectors (reference tests/<fn>/small/*/data.yaml)
but contains no runner for them (SURVEY.md §4). This is ours. `output: null`
means the call must reject the input.

Both math tiers are gated (the mainnet_ctx fixture is parametrized over
the host oracle and the device backend). The device tier's XLA-CPU limb
kernels cost minutes per valid 4096-element case on a small CI box, so
by default the device tier runs every REJECTION case plus the first few
valid cases per function; LWKZG_FULL_VECTOR_GATE=1 (set in CI) runs all
416 checks.
"""

import glob
import os

import pytest
import yaml

from .conftest import REFERENCE_TESTS, reference_vectors_available

pytestmark = pytest.mark.skipif(
    not reference_vectors_available(),
    reason="reference test vectors not mounted",
)


def _cases(fn):
    pattern = os.path.join(REFERENCE_TESTS, fn, "small", "*", "data.yaml")
    paths = sorted(glob.glob(pattern))
    return [
        pytest.param(p, id=os.path.basename(os.path.dirname(p)))
        for p in paths
    ]


def _hx(s):
    return bytes.fromhex(s[2:])


def _run(ctx, fn, inp):
    if fn == "blob_to_kzg_commitment":
        return "0x" + ctx.blob_to_kzg_commitment(_hx(inp["blob"])).hex()
    if fn == "compute_kzg_proof":
        proof, y = ctx.compute_kzg_proof(_hx(inp["blob"]), _hx(inp["z"]))
        return ["0x" + proof.hex(), "0x" + y.hex()]
    if fn == "compute_blob_kzg_proof":
        return (
            "0x"
            + ctx.compute_blob_kzg_proof(
                _hx(inp["blob"]), _hx(inp["commitment"])
            ).hex()
        )
    if fn == "verify_kzg_proof":
        return ctx.verify_kzg_proof(
            _hx(inp["commitment"]), _hx(inp["z"]), _hx(inp["y"]), _hx(inp["proof"])
        )
    if fn == "verify_blob_kzg_proof":
        return ctx.verify_blob_kzg_proof(
            _hx(inp["blob"]), _hx(inp["commitment"]), _hx(inp["proof"])
        )
    if fn == "verify_blob_kzg_proof_batch":
        return ctx.verify_blob_kzg_proof_batch(
            [_hx(b) for b in inp["blobs"]],
            [_hx(c) for c in inp["commitments"]],
            [_hx(p) for p in inp["proofs"]],
        )
    raise AssertionError(fn)


_FULL_GATE = os.environ.get("LWKZG_FULL_VECTOR_GATE") == "1"
_DEVICE_VALID_SAMPLE = 3  # valid cases per function on the device tier
_valid_seen = {}


def _check(mainnet_ctx, fn, path):
    from lambdaworks_kzg_tpu.models.eip4844 import KZGError
    from lambdaworks_kzg_tpu.models.kzg import HostBackend

    with open(path) as f:
        data = yaml.safe_load(f)
    is_device = not isinstance(mainnet_ctx.kzg.backend, HostBackend)
    if is_device and not _FULL_GATE and data["output"] is not None:
        seen = _valid_seen.setdefault(fn, [0])
        seen[0] += 1
        if seen[0] > _DEVICE_VALID_SAMPLE:
            pytest.skip(
                "device-tier valid-case sample cap "
                "(LWKZG_FULL_VECTOR_GATE=1 runs all)"
            )
    try:
        got = _run(mainnet_ctx, fn, data["input"])
    except (KZGError, ValueError):
        got = None
    assert got == data["output"]


@pytest.mark.parametrize("path", _cases("blob_to_kzg_commitment"))
def test_blob_to_kzg_commitment(mainnet_ctx, path):
    _check(mainnet_ctx, "blob_to_kzg_commitment", path)


@pytest.mark.parametrize("path", _cases("compute_kzg_proof"))
def test_compute_kzg_proof(mainnet_ctx, path):
    _check(mainnet_ctx, "compute_kzg_proof", path)


@pytest.mark.parametrize("path", _cases("compute_blob_kzg_proof"))
def test_compute_blob_kzg_proof(mainnet_ctx, path):
    _check(mainnet_ctx, "compute_blob_kzg_proof", path)


@pytest.mark.parametrize("path", _cases("verify_kzg_proof"))
def test_verify_kzg_proof(mainnet_ctx, path):
    _check(mainnet_ctx, "verify_kzg_proof", path)


@pytest.mark.parametrize("path", _cases("verify_blob_kzg_proof"))
def test_verify_blob_kzg_proof(mainnet_ctx, path):
    _check(mainnet_ctx, "verify_blob_kzg_proof", path)


@pytest.mark.parametrize("path", _cases("verify_blob_kzg_proof_batch"))
def test_verify_blob_kzg_proof_batch(mainnet_ctx, path):
    _check(mainnet_ctx, "verify_blob_kzg_proof_batch", path)
