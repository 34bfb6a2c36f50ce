"""Consensus vectors driven through the C ABI (capi/).

The reference's real contract surface is the C ABI — its fuzzers link
the cdylib (reference fuzz/Makefile:46-48) — but it ships no vector
runner at any layer. This runs the 208 consensus-spec vectors through
`liblambdaworks_kzg_tpu.so` via ctypes: byte-level marshalling, fixed
C buffer sizes, and C_KZG_RET codes all gated, complementing the
Python-surface runner (tests/test_consensus_vectors.py).

The C functions take bare pointers with FIXED sizes (blob 131072,
commitment/proof 48, scalars 32 — reference src/c_kzg_4844.h), so
wrong-length vector inputs cannot be expressed through this ABI; for
those cases the runner asserts the vector expects rejection and that
the caller-side length contract catches them.

Valid compute-family cases run the pure-Python host commit (~2 s
each); by default the first two per function run,
LWKZG_FULL_VECTOR_GATE=1 (set in CI) runs all.
"""

import ctypes
import glob
import os
import subprocess

import pytest
import yaml

from .conftest import REFERENCE_TESTS, reference_vectors_available

pytestmark = pytest.mark.skipif(
    not reference_vectors_available(),
    reason="reference test vectors not mounted",
)

CAPI_DIR = os.path.join(os.path.dirname(__file__), "..", "capi")
LIB = os.path.join(CAPI_DIR, "liblambdaworks_kzg_tpu.so")
SETUP_TXT = os.path.join(
    os.path.dirname(__file__), "..", "testdata", "trusted_setup.txt"
)

@pytest.fixture(scope="module", autouse=True)
def _host_backend_env():
    """Pin the embedded adapter to the host tier for this module only
    (a module-level env write leaks into later test modules — see
    tests/test_capi.py)."""
    had = "LWKZG_BACKEND" in os.environ
    old = os.environ.get("LWKZG_BACKEND")
    os.environ.setdefault("LWKZG_BACKEND", "host")
    yield
    if had:
        os.environ["LWKZG_BACKEND"] = old
    else:
        os.environ.pop("LWKZG_BACKEND", None)


BLOB = 4096 * 32
G1 = 48
SCALAR = 32

_FULL = os.environ.get("LWKZG_FULL_VECTOR_GATE") == "1"
_VALID_CAP = 2  # valid compute cases per function unless full gate
_valid_seen = {}


class KZGSettings(ctypes.Structure):
    _fields_ = [
        ("fs", ctypes.c_void_p),
        ("g1_values", ctypes.c_void_p),
        ("g2_values", ctypes.c_void_p),
    ]


@pytest.fixture(scope="module")
def lib():
    if not os.path.exists(LIB):
        subprocess.run(
            ["make", "-C", CAPI_DIR], check=True, capture_output=True
        )
    lib = ctypes.CDLL(LIB)
    for fn in (
        "load_trusted_setup_file",
        "blob_to_kzg_commitment",
        "compute_kzg_proof",
        "compute_blob_kzg_proof",
        "verify_kzg_proof",
        "verify_blob_kzg_proof",
        "verify_blob_kzg_proof_batch",
    ):
        getattr(lib, fn).restype = ctypes.c_int
    return lib


@pytest.fixture(scope="module")
def settings(lib):
    if not os.path.exists(SETUP_TXT):
        pytest.skip("bundled mainnet setup missing")
    s = KZGSettings()
    libc = ctypes.CDLL(None)
    libc.fopen.restype = ctypes.c_void_p
    fp = libc.fopen(SETUP_TXT.encode(), b"r")
    assert fp
    ret = lib.load_trusted_setup_file(ctypes.byref(s), ctypes.c_void_p(fp))
    libc.fclose(ctypes.c_void_p(fp))
    assert ret == 0
    yield s
    lib.free_trusted_setup(ctypes.byref(s))


def _cases(fn):
    pattern = os.path.join(REFERENCE_TESTS, fn, "small", "*", "data.yaml")
    return [
        pytest.param(p, id=os.path.basename(os.path.dirname(p)))
        for p in sorted(glob.glob(pattern))
    ]


def _hx(s):
    return bytes.fromhex(s[2:])


def _load(path):
    with open(path) as f:
        return yaml.safe_load(f)


def _sized(data, *pairs):
    """Decode (hex, expected_size) inputs; None if any length is off —
    inexpressible through the fixed-size C ABI."""
    out = []
    for hexstr, size in pairs:
        b = _hx(hexstr)
        if len(b) != size:
            return None
        out.append(b)
    return out


def _cap_valid(fn, data):
    if _FULL or data["output"] is None:
        return
    seen = _valid_seen.setdefault(fn, [0])
    seen[0] += 1
    if seen[0] > _VALID_CAP:
        pytest.skip("capi valid-case cap (LWKZG_FULL_VECTOR_GATE=1 runs all)")


@pytest.mark.parametrize("path", _cases("blob_to_kzg_commitment"))
def test_capi_blob_to_kzg_commitment(lib, settings, path):
    data = _load(path)
    args = _sized(data, (data["input"]["blob"], BLOB))
    if args is None:
        assert data["output"] is None
        return
    _cap_valid("blob_to_kzg_commitment", data)
    out = ctypes.create_string_buffer(G1)
    ret = lib.blob_to_kzg_commitment(out, args[0], ctypes.byref(settings))
    if data["output"] is None:
        assert ret != 0
    else:
        assert ret == 0
        assert out.raw[:G1] == _hx(data["output"])


@pytest.mark.parametrize("path", _cases("compute_kzg_proof"))
def test_capi_compute_kzg_proof(lib, settings, path):
    data = _load(path)
    inp = data["input"]
    args = _sized(data, (inp["blob"], BLOB), (inp["z"], SCALAR))
    if args is None:
        assert data["output"] is None
        return
    _cap_valid("compute_kzg_proof", data)
    proof = ctypes.create_string_buffer(G1)
    y = ctypes.create_string_buffer(SCALAR)
    ret = lib.compute_kzg_proof(
        proof, y, args[0], args[1], ctypes.byref(settings)
    )
    if data["output"] is None:
        assert ret != 0
    else:
        assert ret == 0
        assert proof.raw[:G1] == _hx(data["output"][0])
        assert y.raw[:SCALAR] == _hx(data["output"][1])


@pytest.mark.parametrize("path", _cases("compute_blob_kzg_proof"))
def test_capi_compute_blob_kzg_proof(lib, settings, path):
    data = _load(path)
    inp = data["input"]
    args = _sized(data, (inp["blob"], BLOB), (inp["commitment"], G1))
    if args is None:
        assert data["output"] is None
        return
    _cap_valid("compute_blob_kzg_proof", data)
    proof = ctypes.create_string_buffer(G1)
    ret = lib.compute_blob_kzg_proof(
        proof, args[0], args[1], ctypes.byref(settings)
    )
    if data["output"] is None:
        assert ret != 0
    else:
        assert ret == 0
        assert proof.raw[:G1] == _hx(data["output"])


@pytest.mark.parametrize("path", _cases("verify_kzg_proof"))
def test_capi_verify_kzg_proof(lib, settings, path):
    data = _load(path)
    inp = data["input"]
    args = _sized(
        data,
        (inp["commitment"], G1),
        (inp["z"], SCALAR),
        (inp["y"], SCALAR),
        (inp["proof"], G1),
    )
    if args is None:
        assert data["output"] is None
        return
    ok = ctypes.c_bool(False)
    ret = lib.verify_kzg_proof(
        ctypes.byref(ok), *args, ctypes.byref(settings)
    )
    if data["output"] is None:
        assert ret != 0
    else:
        assert ret == 0
        assert ok.value is data["output"]


@pytest.mark.parametrize("path", _cases("verify_blob_kzg_proof"))
def test_capi_verify_blob_kzg_proof(lib, settings, path):
    data = _load(path)
    inp = data["input"]
    args = _sized(
        data, (inp["blob"], BLOB), (inp["commitment"], G1), (inp["proof"], G1)
    )
    if args is None:
        assert data["output"] is None
        return
    ok = ctypes.c_bool(False)
    ret = lib.verify_blob_kzg_proof(
        ctypes.byref(ok), *args, ctypes.byref(settings)
    )
    if data["output"] is None:
        assert ret != 0
    else:
        assert ret == 0
        assert ok.value is data["output"]


@pytest.mark.parametrize("path", _cases("verify_blob_kzg_proof_batch"))
def test_capi_verify_blob_kzg_proof_batch(lib, settings, path):
    data = _load(path)
    inp = data["input"]
    blobs = [_hx(h) for h in inp["blobs"]]
    cs = [_hx(h) for h in inp["commitments"]]
    ps = [_hx(h) for h in inp["proofs"]]
    n = len(blobs)
    if (
        len(cs) != n
        or len(ps) != n
        or any(len(b) != BLOB for b in blobs)
        or any(len(c) != G1 for c in cs)
        or any(len(p) != G1 for p in ps)
    ):
        # count/length mismatches are caller-side contract violations
        # the flat C buffers cannot express
        assert data["output"] is None
        return
    ok = ctypes.c_bool(False)
    ret = lib.verify_blob_kzg_proof_batch(
        ctypes.byref(ok),
        b"".join(blobs),
        b"".join(cs),
        b"".join(ps),
        n,
        ctypes.byref(settings),
    )
    if data["output"] is None:
        assert ret != 0
    else:
        assert ret == 0
        assert ok.value is data["output"]
