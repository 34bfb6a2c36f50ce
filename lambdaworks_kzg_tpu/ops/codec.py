"""Vectorized blob <-> limb codecs (host-side numpy, zero Python loops).

Replaces the per-element `FE::from_bytes` loop of the reference
(src/utils.rs:27-41 via lambdaworks ByteConversion) with one numpy view:
blob field elements are 32-byte little-endian, so the 16-bit limb array is
literally the blob bytes reinterpreted as `<u2` — the wire format IS the
device format. Canonicality (value < r) is checked lexicographically over
limbs, vectorized across the whole blob.
"""

import numpy as np

from ..constants import R
from . import limbs as lb

_R_LIMBS = lb.ints_to_limbs([R], 16)[:, 0]  # uint32[16], little-endian limbs


def blob_to_limbs(blob: bytes, n: int) -> np.ndarray:
    """131072-byte blob -> uint32[16, n] plain Fr limb array (limbs-first).

    Raises ValueError on wrong size or non-canonical field elements
    (parity: the `*_invalid_blob_*` consensus vectors must reject).
    """
    if len(blob) != 32 * n:
        raise ValueError(f"blob must be {32 * n} bytes, got {len(blob)}")
    limbs = (
        np.frombuffer(blob, dtype="<u2").reshape(n, 16).T.astype(np.uint32)
    )  # [16, n]
    if not np.all(_canonical_mask(limbs)):
        raise ValueError("non-canonical field element in blob (>= r)")
    return limbs


def _canonical_mask(limbs: np.ndarray) -> np.ndarray:
    """bool[n]: element < r, lexicographic over limbs (most significant first)."""
    n = limbs.shape[1]
    lt = np.zeros(n, dtype=bool)
    decided = np.zeros(n, dtype=bool)
    for i in range(15, -1, -1):
        col = limbs[i]
        ri = _R_LIMBS[i]
        lt |= ~decided & (col < ri)
        decided |= col != ri
    return lt  # equal-to-r rows stay False: not canonical
