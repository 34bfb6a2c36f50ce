"""Drive the C ABI (capi/) end-to-end through ctypes.

Exercises the same 7-function surface external C callers (Ethereum
clients, fuzzers) use against the reference cdylib — here backed by the
embedded framework. Uses the degree-4 dev setup (tiny blobs) and the
host backend so the test is CPU-fast.
"""

import ctypes
import os
import subprocess

import pytest

CAPI_DIR = os.path.join(os.path.dirname(__file__), "..", "capi")
LIB = os.path.join(CAPI_DIR, "liblambdaworks_kzg_tpu.so")
SETUP_4 = os.path.join(
    os.path.dirname(__file__), "..", "testdata", "trusted_setup_4.txt"
)

@pytest.fixture(scope="module", autouse=True)
def _host_backend_env():
    """Pin the embedded adapter to the host tier for this module only.

    A module-level os.environ write leaks into every later test module
    (pytest imports all modules at collection): round 3's full-suite run
    failed test_mesh_api because KZGConfig.from_env() saw backend=host."""
    had = "LWKZG_BACKEND" in os.environ
    old = os.environ.get("LWKZG_BACKEND")
    os.environ.setdefault("LWKZG_BACKEND", "host")
    yield
    if had:
        os.environ["LWKZG_BACKEND"] = old
    else:
        os.environ.pop("LWKZG_BACKEND", None)


def _build():
    if not os.path.exists(LIB):
        subprocess.run(["make", "-C", CAPI_DIR], check=True, capture_output=True)


@pytest.fixture(scope="module")
def lib():
    _build()
    lib = ctypes.CDLL(LIB)
    lib.load_trusted_setup_file.restype = ctypes.c_int
    lib.blob_to_kzg_commitment.restype = ctypes.c_int
    lib.compute_kzg_proof.restype = ctypes.c_int
    lib.compute_blob_kzg_proof.restype = ctypes.c_int
    lib.verify_kzg_proof.restype = ctypes.c_int
    lib.verify_blob_kzg_proof.restype = ctypes.c_int
    lib.verify_blob_kzg_proof_batch.restype = ctypes.c_int
    return lib


class KZGSettings(ctypes.Structure):
    _fields_ = [
        ("fs", ctypes.c_void_p),
        ("g1_values", ctypes.c_void_p),
        ("g2_values", ctypes.c_void_p),
    ]


N = 4
BLOB_SIZE = N * 32


@pytest.fixture(scope="module")
def settings(lib):
    if not os.path.exists(SETUP_4):
        pytest.skip("reference trusted_setup_4.txt unavailable")
    s = KZGSettings()
    libc = ctypes.CDLL(None)
    libc.fopen.restype = ctypes.c_void_p
    fp = libc.fopen(SETUP_4.encode(), b"r")
    assert fp
    ret = lib.load_trusted_setup_file(ctypes.byref(s), ctypes.c_void_p(fp))
    libc.fclose(ctypes.c_void_p(fp))
    assert ret == 0, f"load_trusted_setup_file -> {ret}"
    yield s
    lib.free_trusted_setup(ctypes.byref(s))
    assert s.g1_values in (None, 0)


def _blob(seed: int) -> bytes:
    import random

    rng = random.Random(seed)
    return b"".join(
        rng.randrange(2**248).to_bytes(31, "little") + b"\x00" for _ in range(N)
    )


def test_commit_prove_verify_roundtrip(lib, settings):
    blob = _blob(1)
    commitment = ctypes.create_string_buffer(48)
    assert lib.blob_to_kzg_commitment(commitment, blob, ctypes.byref(settings)) == 0

    proof = ctypes.create_string_buffer(48)
    assert (
        lib.compute_blob_kzg_proof(
            proof, blob, commitment, ctypes.byref(settings)
        )
        == 0
    )

    ok = ctypes.c_bool(False)
    assert (
        lib.verify_blob_kzg_proof(
            ctypes.byref(ok), blob, commitment, proof, ctypes.byref(settings)
        )
        == 0
    )
    assert ok.value

    # tampered proof (flipped sign bit -> the negated point) must reject
    bad = bytes([proof.raw[0] ^ 0x20]) + proof.raw[1:48]
    ret = lib.verify_blob_kzg_proof(
        ctypes.byref(ok), blob, commitment, bad, ctypes.byref(settings)
    )
    assert ret != 0 or not ok.value


def test_compute_kzg_proof_outputs_y(lib, settings):
    blob = _blob(2)
    z = (5).to_bytes(32, "little")
    proof = ctypes.create_string_buffer(48)
    y = ctypes.create_string_buffer(32)
    assert (
        lib.compute_kzg_proof(proof, y, blob, z, ctypes.byref(settings)) == 0
    )
    commitment = ctypes.create_string_buffer(48)
    lib.blob_to_kzg_commitment(commitment, blob, ctypes.byref(settings))
    ok = ctypes.c_bool(False)
    assert (
        lib.verify_kzg_proof(
            ctypes.byref(ok), commitment, z, y, proof, ctypes.byref(settings)
        )
        == 0
    )
    assert ok.value


def test_batch_verify(lib, settings):
    blobs, cs, ps = b"", b"", b""
    for i in range(3):
        blob = _blob(10 + i)
        commitment = ctypes.create_string_buffer(48)
        lib.blob_to_kzg_commitment(commitment, blob, ctypes.byref(settings))
        proof = ctypes.create_string_buffer(48)
        lib.compute_blob_kzg_proof(proof, blob, commitment, ctypes.byref(settings))
        blobs += blob
        cs += commitment.raw[:48]
        ps += proof.raw[:48]
    ok = ctypes.c_bool(False)
    assert (
        lib.verify_blob_kzg_proof_batch(
            ctypes.byref(ok), blobs, cs, ps, 3, ctypes.byref(settings)
        )
        == 0
    )
    assert ok.value
    # n == 0 accepts (spec; deliberate deviation from the reference,
    # which returns ok=false at src/lib.rs:537-543 against its own docs)
    assert (
        lib.verify_blob_kzg_proof_batch(
            ctypes.byref(ok), b"", b"", b"", 0, ctypes.byref(settings)
        )
        == 0
    )
    assert ok.value


def test_bad_inputs_return_badargs(lib, settings):
    commitment = ctypes.create_string_buffer(48)
    bad_blob = b"\xff" * BLOB_SIZE  # non-canonical field elements
    ret = lib.blob_to_kzg_commitment(commitment, bad_blob, ctypes.byref(settings))
    assert ret == 1  # C_KZG_BADARGS

    ok = ctypes.c_bool(True)
    garbage = b"\x12" * 48
    blob = _blob(3)
    ret = lib.verify_blob_kzg_proof(
        ctypes.byref(ok), blob, garbage, garbage, ctypes.byref(settings)
    )
    assert ret == 1
    ret = lib.blob_to_kzg_commitment(commitment, None, ctypes.byref(settings))
    assert ret == 1


def test_load_trusted_setup_bad_counts(lib):
    s = KZGSettings()
    ret = lib.load_trusted_setup(ctypes.byref(s), b"\x00" * 48, 1, b"\x00" * 96, 1)
    assert ret == 1  # BADARGS (reference src/lib.rs:716-718)


def test_blst_point_tables_readable(settings):
    """The KZGSettings tables hold real blst-shaped points a C caller may
    read (reference parity, src/srs.rs:131-247): canonical coordinates,
    l[0] = most-significant u64, projective z == 1."""
    from lambdaworks_kzg_tpu.capi_adapter import _p1_mem, _p2_mem
    from lambdaworks_kzg_tpu.models.srs import load_trusted_setup_file

    setup = load_trusted_setup_file(SETUP_4)
    assert settings.fs  # opaque handle (deviation from reference's NULL)
    g1_mem = ctypes.string_at(settings.g1_values, 144 * setup.n)
    for i, aff in enumerate(setup.g1_monomial):
        assert g1_mem[i * 144 : (i + 1) * 144] == _p1_mem(aff), i
    g2_mem = ctypes.string_at(settings.g2_values, 288 * len(setup.g2_monomial))
    for i, aff in enumerate(setup.g2_monomial):
        assert g2_mem[i * 288 : (i + 1) * 288] == _p2_mem(aff), i
