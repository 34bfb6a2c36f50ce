"""Python side of the C ABI shim (capi/shim.c).

Every function returns a (ret_code, payload) tuple instead of raising, so
the C layer only unpacks — no exception plumbing across the embedding
boundary. Return codes mirror the reference's C_KZG_RET
(reference src/lib.rs:45-57): 0 OK, 1 BADARGS, 2 ERROR, 3 MALLOC.
"""

from typing import Optional, Tuple

from .models.eip4844 import EIP4844Context, KZGError
from .models.srs import (
    SetupLoadError,
    TrustedSetup,
    _parse_setup_text,
    load_trusted_setup_from_bytes,
)

C_KZG_OK = 0
C_KZG_BADARGS = 1
C_KZG_ERROR = 2
C_KZG_MALLOC = 3


def _wrap(fn):
    try:
        return C_KZG_OK, fn()
    except SetupLoadError as e:
        # the reference maps only the setup count check to BADARGS
        # (src/lib.rs:716-718); we extend it to all malformed-argument
        # failures, which is what upstream c-kzg-4844 does
        return C_KZG_BADARGS, str(e).encode()
    except KZGError as e:
        return C_KZG_BADARGS, str(e).encode()
    except Exception as e:  # anything unexpected
        return C_KZG_ERROR, str(e).encode()


def new_context_from_parts(
    g1_bytes: bytes, n1: int, g2_bytes: bytes, n2: int
) -> Tuple[int, object]:
    """load_trusted_setup parity (reference src/lib.rs:709-776)."""

    def go():
        g1 = [bytes(g1_bytes[i * 48 : (i + 1) * 48]) for i in range(n1)]
        g2 = [bytes(g2_bytes[i * 96 : (i + 1) * 96]) for i in range(n2)]
        setup = load_trusted_setup_from_bytes(g1, g2, strict_counts=True)
        return EIP4844Context(setup)

    return _wrap(go)


def new_context_from_text(text: bytes) -> Tuple[int, object]:
    """load_trusted_setup_file parity (reference src/lib.rs:779-802)."""

    def go():
        g1, g2 = _parse_setup_text(text.decode("utf-8"))
        setup = load_trusted_setup_from_bytes(g1, g2, strict_counts=False)
        return EIP4844Context(setup)

    return _wrap(go)


def blob_size(ctx: EIP4844Context) -> int:
    return ctx.n * 32


def blob_to_kzg_commitment(ctx, blob: bytes) -> Tuple[int, bytes]:
    return _wrap(lambda: ctx.blob_to_kzg_commitment(blob))


def compute_kzg_proof(ctx, blob: bytes, z: bytes) -> Tuple[int, bytes]:
    """Returns proof(48) || y(32) concatenated."""

    def go():
        proof, y = ctx.compute_kzg_proof(blob, z)
        return proof + y

    return _wrap(go)


def compute_blob_kzg_proof(ctx, blob: bytes, commitment: bytes) -> Tuple[int, bytes]:
    return _wrap(lambda: ctx.compute_blob_kzg_proof(blob, commitment))


def verify_kzg_proof(ctx, c: bytes, z: bytes, y: bytes, p: bytes):
    return _wrap(lambda: ctx.verify_kzg_proof(c, z, y, p))


def verify_blob_kzg_proof(ctx, blob: bytes, c: bytes, p: bytes):
    return _wrap(lambda: ctx.verify_blob_kzg_proof(blob, c, p))


def verify_blob_kzg_proof_batch(
    ctx, blobs: bytes, cs: bytes, ps: bytes, n: int
):
    def go():
        size = ctx.n * 32
        return ctx.verify_blob_kzg_proof_batch(
            [blobs[i * size : (i + 1) * size] for i in range(n)],
            [cs[i * 48 : (i + 1) * 48] for i in range(n)],
            [ps[i * 48 : (i + 1) * 48] for i in range(n)],
        )

    return _wrap(go)


# -- blst-layout point tables (C-readable KZGSettings contents) --------------
#
# The reference's KZGSettings carries real point arrays a C caller may
# legally read (reference src/lib.rs:210-232; filled at src/srs.rs:131-247):
# blst_p1/blst_p2-shaped structs holding CANONICAL (non-Montgomery)
# coordinates with big-endian u64 word order (srs.rs:154-171 reads l[0]'s
# big-endian bytes first) and projective z == 1. We reproduce that layout
# exactly so callers that walk the tables keep working; our own entry
# points never read them (the converted SRS lives device-side).


def _fp_words_mem(v: int) -> bytes:
    """48-byte struct memory image of blst_fp {u64 l[6]} under the
    reference's encoding: l[0] = most-significant word, native (LE)
    byte order in memory."""
    be = v.to_bytes(48, "big")
    return b"".join(be[i * 8 : (i + 1) * 8][::-1] for i in range(6))


def _p1_mem(aff) -> bytes:
    if aff is None:  # reference infinity: x = y = 0, z = [0,..,0,1]
        return _fp_words_mem(0) * 2 + _fp_words_mem(1)
    return _fp_words_mem(aff[0]) + _fp_words_mem(aff[1]) + _fp_words_mem(1)


def _p2_mem(aff) -> bytes:
    if aff is None:
        return _fp_words_mem(0) * 4 + _fp_words_mem(1) + _fp_words_mem(0)
    (x0, x1), (y0, y1) = aff
    return (
        _fp_words_mem(x0)
        + _fp_words_mem(x1)
        + _fp_words_mem(y0)
        + _fp_words_mem(y1)
        + _fp_words_mem(1)
        + _fp_words_mem(0)
    )


def blst_tables(ctx: EIP4844Context) -> Tuple[int, tuple]:
    """(g1_table, g2_table) struct memory images: n1 x blst_p1 (144 B,
    monomial basis, as loaded from the setup file — reference stores the
    same basis) and n2 x blst_p2 (288 B)."""

    def go():
        s = ctx.setup
        g1 = b"".join(_p1_mem(a) for a in s.g1_monomial)
        g2 = b"".join(_p2_mem(a) for a in s.g2_monomial)
        return (g1, g2)

    return _wrap(go)
