"""Blob <-> field-element codecs (reference src/utils.rs:27-79 parity).

The reference converts blobs to monomial-coefficient polynomials
(blob_to_polynomial, utils.rs:27-41) and back (polynomial_to_blob,
utils.rs:44-54; zero-padded variant utils.rs:56-79). This framework uses
the consensus-spec semantics — a blob is the polynomial's EVALUATIONS on
the bit-reversed roots-of-unity domain, serialized little-endian — so the
codecs speak evaluations; ops/ntt.py converts to/from coefficient form.
"""

from typing import List, Sequence

from ..constants import BYTES_PER_FIELD_ELEMENT, R
from . import hashing as H


def blob_to_evaluations(blob: bytes, n: int) -> List[int]:
    """Blob -> n field elements (raises ValueError on non-canonical)."""
    if len(blob) != n * BYTES_PER_FIELD_ELEMENT:
        raise ValueError(f"blob must be {n * BYTES_PER_FIELD_ELEMENT} bytes")
    return [
        H.bytes_to_bls_field(blob[i * 32 : (i + 1) * 32]) for i in range(n)
    ]


def evaluations_to_blob(evals: Sequence[int]) -> bytes:
    """Field elements -> blob bytes (exact length)."""
    return b"".join(H.bls_field_to_bytes(e % R) for e in evals)


def evaluations_to_blob_with_size(evals: Sequence[int], n: int) -> bytes:
    """Zero-pad to a full n-element blob (parity:
    polynomial_to_blob_with_size, reference src/utils.rs:56-79)."""
    if len(evals) > n:
        raise ValueError("too many evaluations")
    out = evaluations_to_blob(evals)
    return out + b"\x00" * ((n - len(evals)) * BYTES_PER_FIELD_ELEMENT)


def blob_to_coefficients(blob: bytes, n: int) -> List[int]:
    """Blob -> monomial coefficients (iNTT of the brp-ordered evals).

    The evaluation<->coefficient bridge the reference left unimplemented
    (FFTSettings, reference src/lib.rs:176-208)."""
    from ..host import fft as FFT

    evals_brp = blob_to_evaluations(blob, n)
    evals_nat = FFT.bit_reversal_permutation(evals_brp)
    return FFT.fr_fft(evals_nat, inverse=True)


def coefficients_to_blob(coeffs: Sequence[int], n: int) -> bytes:
    """Monomial coefficients -> blob (NTT then bit-reverse)."""
    from ..host import fft as FFT

    if len(coeffs) > n:
        raise ValueError("too many coefficients")
    padded = list(coeffs) + [0] * (n - len(coeffs))
    evals_nat = FFT.fr_fft(padded)
    return evaluations_to_blob(FFT.bit_reversal_permutation(evals_nat))
