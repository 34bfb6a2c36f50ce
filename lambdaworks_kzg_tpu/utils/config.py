"""Runtime configuration (SURVEY.md §5 "config system").

The reference hard-codes its parameters as compile-time constants
(reference src/lib.rs:59-98) and a C build macro (src/c_kzg_4844.h:39-67).
Here one frozen dataclass carries them plus the TPU-specific knobs, and it
is the single decision point for backend / window / mesh selection:
``KZG``/``EIP4844Context`` resolve their backend through
``KZGConfig.make_backend`` (resolved in models/kzg.KZG.__init__).

Environment overrides (all collected by ``KZGConfig.from_env``):

  LWKZG_BACKEND=host|device     force the math tier
  LWKZG_MSM_WINDOW_BITS=N       Pippenger window override (1..16, any N)
  LWKZG_MESH_SHAPE=DxP          build a (data, points) device mesh, e.g. 2x4
  LWKZG_TRUSTED_SETUP=<path>    trusted setup file to load by default
  LWKZG_DEVICE_PAIRING=1        run pairing checks on the device tier
                                (ops/pairing_ops) instead of native C++
  LWKZG_PALLAS=0|1              force/disable fused Mosaic kernels
  LWKZG_NATIVE=0                disable the native C++ tier
  LWKZG_COMPILE_CACHE=0|<path>  disable / relocate the XLA compile cache

MSM kernel tuning knobs (read ONCE at ops/msm import — jitted steps are
cached, so later changes cannot take effect; values are validated and
rounded to powers of two there):

  LWKZG_MSM_ROW_WORDS=64        gathered point-row width, u32 words
  LWKZG_MSM_CHUNK=16            variable-base bulk-gather chunk
  LWKZG_MSM_FB_CHUNK=8          fixed-base bulk-gather chunk
"""

import os
from dataclasses import dataclass
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

    # Pippenger window bits (None = auto; any 1..16 — non-dividing
    # sizes use the top-window alias split, ops/msm._top_bits)
    msm_window_bits: Optional[int] = None

    # device mesh shape (data, points); None = single chip
    mesh_shape: Optional[Tuple[int, int]] = None

    # trusted setup source (None = bundled mainnet setup)
    trusted_setup_path: Optional[str] = None

    # math tier: None = auto (device when JAX present)
    backend: Optional[str] = None

    # pairing checks through the device tier (batched Miller loop on
    # the chip) instead of the native C++ tier
    device_pairing: bool = False

    def validate(self) -> "KZGConfig":
        n = self.field_elements_per_blob
        if n & (n - 1) != 0:
            raise ValueError("field_elements_per_blob must be a power of two")
        if self.msm_window_bits is not None and not (
            1 <= self.msm_window_bits <= 16
        ):
            # any c works: the top window's load is alias-split for
            # non-dividing window sizes (ops/msm._top_bits)
            raise ValueError("msm_window_bits must be in [1, 16]")
        if self.backend not in (None, "host", "device"):
            raise ValueError("backend must be host|device|None")
        if self.mesh_shape is not None:
            d, p = self.mesh_shape
            if d < 1 or p < 1:
                raise ValueError("mesh_shape axes must be >= 1")
        return self

    @staticmethod
    def from_env() -> "KZGConfig":
        """Collect the documented LWKZG_* environment overrides."""
        mesh = os.environ.get("LWKZG_MESH_SHAPE")
        mesh_shape = None
        if mesh:
            try:
                d, p = mesh.lower().split("x")
                mesh_shape = (int(d), int(p))
            except ValueError as e:
                raise ValueError(
                    f"LWKZG_MESH_SHAPE must look like '2x4', got {mesh!r}"
                ) from e
        window = os.environ.get("LWKZG_MSM_WINDOW_BITS")
        return KZGConfig(
            device_pairing=os.environ.get("LWKZG_DEVICE_PAIRING") == "1",
            msm_window_bits=int(window) if window else None,
            mesh_shape=mesh_shape,
            trusted_setup_path=os.environ.get("LWKZG_TRUSTED_SETUP") or None,
            backend=os.environ.get("LWKZG_BACKEND") or None,
        ).validate()

    # -- consumers ----------------------------------------------------------
    def make_mesh(self):
        """Build the (data, points) jax Mesh this config names, or None."""
        if self.mesh_shape is None:
            return None
        from ..parallel.mesh import make_mesh

        return make_mesh(data=self.mesh_shape[0], points=self.mesh_shape[1])

    def make_backend(self, setup, mesh=None):
        """Resolve the math backend for a setup (the single decision
        point used by models/kzg.KZG).

        Auto (backend=None): the device tier only on real accelerators.
        On a CPU host the XLA limb kernels run ~10x slower than the
        Python-int oracle (single-core measured) and first-compiles take
        minutes — HostBackend(+native C++) is strictly better there.
        LWKZG_BACKEND=device or an explicit mesh still forces the device
        tier (the CPU-mesh test/dryrun configurations do exactly that).
        """
        import logging

        log = logging.getLogger(__name__)

        from ..models.kzg import HostBackend

        if self.backend == "host":
            return HostBackend(setup)
        use_mesh = mesh if mesh is not None else self.make_mesh()
        if self.backend is None and use_mesh is None:
            try:
                import jax

                accel = jax.default_backend() in ("tpu", "gpu")
            except Exception:
                accel = False
            if not accel:
                log.info(
                    "backend auto-select: no accelerator (jax backend is "
                    "CPU or unavailable) -> host tier; set "
                    "LWKZG_BACKEND=device to force the XLA kernels"
                )
                return HostBackend(setup)
        try:
            from ..ops.backend import DeviceBackend

            return DeviceBackend(
                setup,
                window_bits=self.msm_window_bits,
                mesh=use_mesh,
            )
        except Exception:
            if self.backend == "device":
                raise
            log.warning(
                "backend auto-select: device tier failed to initialize; "
                "falling back to the host oracle", exc_info=True
            )
            return HostBackend(setup)

    def load_setup(self):
        """Load the trusted setup this config names (default: mainnet)."""
        from ..models import srs

        if self.trusted_setup_path:
            return srs.load_trusted_setup_file(self.trusted_setup_path)
        return srs.load_mainnet_setup()


DEFAULT_CONFIG = KZGConfig().validate()
