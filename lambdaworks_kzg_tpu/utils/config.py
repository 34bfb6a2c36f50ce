"""Frozen runtime configuration (SURVEY.md §5 "config system").

The reference hard-codes its parameters as compile-time constants
(reference src/lib.rs:59-98) and a C build macro (src/c_kzg_4844.h:39-67).
Here one frozen dataclass carries them plus the TPU-specific knobs, and
the environment overrides are documented in a single place:

  LWKZG_BACKEND=host|device   force the math tier
  LWKZG_PALLAS=0|1            force/disable fused Mosaic kernels
  LWKZG_COMPILE_CACHE=0       disable the persistent XLA compile cache
"""

from dataclasses import dataclass, field
from typing import Optional, Tuple

from ..constants import (
    BYTES_PER_BLOB,
    BYTES_PER_COMMITMENT,
    BYTES_PER_FIELD_ELEMENT,
    BYTES_PER_PROOF,
    FIELD_ELEMENTS_PER_BLOB,
)


@dataclass(frozen=True)
class KZGConfig:
    """All tunables of the framework in one immutable record."""

    # protocol sizes (reference src/lib.rs:70-92)
    field_elements_per_blob: int = FIELD_ELEMENTS_PER_BLOB
    bytes_per_blob: int = BYTES_PER_BLOB
    bytes_per_commitment: int = BYTES_PER_COMMITMENT
    bytes_per_proof: int = BYTES_PER_PROOF
    bytes_per_field_element: int = BYTES_PER_FIELD_ELEMENT

    # Pippenger window bits (None = auto; must divide 256 — see
    # ops/backend._auto_window on top-window skew)
    msm_window_bits: Optional[int] = None

    # device mesh shape (data, points); None = single chip
    mesh_shape: Optional[Tuple[int, int]] = None

    # trusted setup source (None = bundled mainnet cache)
    trusted_setup_path: Optional[str] = None

    # math tier: None = auto (device when JAX+TPU present)
    backend: Optional[str] = None

    def validate(self) -> "KZGConfig":
        n = self.field_elements_per_blob
        if n & (n - 1) != 0:
            raise ValueError("field_elements_per_blob must be a power of two")
        if self.msm_window_bits is not None and 256 % self.msm_window_bits:
            raise ValueError("msm_window_bits must divide 256")
        if self.backend not in (None, "host", "device"):
            raise ValueError("backend must be host|device|None")
        return self


DEFAULT_CONFIG = KZGConfig().validate()
