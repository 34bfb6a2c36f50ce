"""Fiat-Shamir challenge generation (exact byte layouts).

Behavioral parity with reference src/utils.rs:120-206 (compute_challenge,
compute_powers, compute_r_powers), with one deliberate, documented fix:
the reference's `hash_field_unsafe` (src/utils.rs:148-154) converts the
sha256 digest big-endian *without* modular reduction (its own FIXME says
"should be changed to a hash to field method"). The consensus-spec-tests
vectors follow the spec-era hash_to_bls_field: interpret the digest as a
*little-endian* integer and reduce mod r. We implement the spec behavior.
"""

import hashlib
from typing import List, Sequence

from ..constants import (
    BYTES_PER_BLOB,
    FIAT_SHAMIR_PROTOCOL_DOMAIN,
    FIELD_ELEMENTS_PER_BLOB,
    R,
    RANDOM_CHALLENGE_KZG_BATCH_DOMAIN,
)


def hash_to_bls_field(data: bytes) -> int:
    """sha256 digest -> Fr, little-endian, reduced mod r (spec-era rule)."""
    digest = hashlib.sha256(data).digest()
    return int.from_bytes(digest, "little") % R


def bytes_to_bls_field(b: bytes) -> int:
    """32 bytes little-endian -> Fr; must be canonical (< r)."""
    if len(b) != 32:
        raise ValueError("field element must be 32 bytes")
    v = int.from_bytes(b, "little")
    if v >= R:
        raise ValueError("non-canonical field element")
    return v


def bls_field_to_bytes(v: int) -> bytes:
    return (v % R).to_bytes(32, "little")


def compute_challenge(
    blob: bytes,
    commitment_compressed: bytes,
    field_elements_per_blob: int = FIELD_ELEMENTS_PER_BLOB,
) -> int:
    """Parity: reference compute_challenge (src/utils.rs:120-144) —
    domain || u64le(FIELD_ELEMENTS_PER_BLOB) || u64le(0) || blob || C.
    `field_elements_per_blob` is a build parameter in the C header
    (reference src/c_kzg_4844.h:39-67); we take it at runtime."""
    assert len(blob) == field_elements_per_blob * 32
    assert len(commitment_compressed) == 48
    data = (
        FIAT_SHAMIR_PROTOCOL_DOMAIN
        + field_elements_per_blob.to_bytes(8, "little")
        + (0).to_bytes(8, "little")
        + blob
        + commitment_compressed
    )
    return hash_to_bls_field(data)


def compute_powers(x: int, n: int) -> List[int]:
    """[x^0, x^1, ..., x^(n-1)] mod r (reference src/utils.rs:156-164)."""
    out = []
    acc = 1
    for _ in range(n):
        out.append(acc)
        acc = acc * x % R
    return out


def compute_r_powers(
    commitments_compressed: Sequence[bytes],
    zs: Sequence[int],
    ys: Sequence[int],
    proofs_compressed: Sequence[bytes],
    field_elements_per_blob: int = FIELD_ELEMENTS_PER_BLOB,
) -> List[int]:
    """Parity: reference compute_r_powers (src/utils.rs:166-206) —
    domain || u64le(4096) || u64le(n) || n * (C || z || y || proof),
    z and y serialized little-endian per the spec era."""
    n = len(commitments_compressed)
    data = bytearray(
        RANDOM_CHALLENGE_KZG_BATCH_DOMAIN
        + field_elements_per_blob.to_bytes(8, "little")
        + n.to_bytes(8, "little")
    )
    for c, z, y, pr in zip(commitments_compressed, zs, ys, proofs_compressed):
        data += c
        data += bls_field_to_bytes(z)
        data += bls_field_to_bytes(y)
        data += pr
    r = hash_to_bls_field(bytes(data))
    return compute_powers(r, n)
