"""TPU-native KZG / EIP-4844 blob-commitment framework.

A ground-up JAX/XLA/Pallas re-design of the capability surface of
`lambdaclass/lambdaworks_kzg` (the EIP-4844 "minimal interface"):

    from lambdaworks_kzg_tpu import load_trusted_setup_file, EIP4844Context

    setup = load_trusted_setup_file("trusted_setup.txt")
    ctx = EIP4844Context(setup)
    commitment = ctx.blob_to_kzg_commitment(blob)
    proof = ctx.compute_blob_kzg_proof(blob, commitment)
    assert ctx.verify_blob_kzg_proof(blob, commitment, proof)

The seven reference entry points (reference src/lib.rs:245-829) map to:
  blob_to_kzg_commitment      -> EIP4844Context.blob_to_kzg_commitment
  compute_kzg_proof           -> EIP4844Context.compute_kzg_proof
  compute_blob_kzg_proof      -> EIP4844Context.compute_blob_kzg_proof
  verify_kzg_proof            -> EIP4844Context.verify_kzg_proof
  verify_blob_kzg_proof       -> EIP4844Context.verify_blob_kzg_proof
  verify_blob_kzg_proof_batch -> EIP4844Context.verify_blob_kzg_proof_batch
  load_trusted_setup(_file)   -> load_trusted_setup / load_trusted_setup_file
  free_trusted_setup          -> (garbage collection; no manual free)
"""

def _configure_compile_cache():
    """Configure THE persistent XLA compile cache (the single knob).

    LWKZG_COMPILE_CACHE=0       disable
    LWKZG_COMPILE_CACHE=<path>  use <path> as the cache directory
    (unset)                     ~/.cache/lambdaworks_kzg_tpu/jax
    A user-set jax_compilation_cache_dir / JAX_COMPILATION_CACHE_DIR wins.

    The fused limb-arithmetic kernels compile in minutes cold and
    milliseconds cached; a library whose first call costs minutes per
    process is unusable without this. `warmup()` pre-populates it.
    """
    import os

    knob = os.environ.get("LWKZG_COMPILE_CACHE")
    if knob == "0":
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            cache = knob or os.path.join(
                os.path.expanduser("~"), ".cache", "lambdaworks_kzg_tpu", "jax"
            )
            _migrate_legacy_cache(cache)
            _seed_bundled_cache(cache)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # jax absent or too old: the host tier still works


def _seed_bundled_cache(cache: str, bundle: str = None) -> None:
    """Seed the per-user XLA cache from a site-built bundle, if present.

    cache/tpu_jax_cache/ is OPTIONAL and not shipped in the repo: one
    compiled-program entry for a protocol-shape kernel is ~100-280 MB
    and already internally compressed (xz gains ~0%), so committing a
    bundle is not viable. Sites that bake machine images instead run
    `scripts/prewarm.py --bundle cache/tpu_jax_cache` once on a chip;
    every later process on image then starts at cache-hit latency.
    What the repo DOES ship is the AOT-exported programs
    (cache/aot_*.jaxexp, a few MB each — see ops/aot.py), which remove
    the minutes of client-side Mosaic lowering; the remaining cold-start
    cost without a site bundle is one XLA compile per kernel shape.
    Entries are copied (not symlinked) so the user cache stays
    self-contained; wrong-platform entries are simply never hit (keys
    include platform + compile options)."""
    import os
    import shutil

    if bundle is None:
        bundle = os.path.join(
            os.path.dirname(__file__), "..", "cache", "tpu_jax_cache"
        )
    if not os.path.isdir(bundle):
        return
    try:
        os.makedirs(cache, exist_ok=True)
        for name in os.listdir(bundle):
            dst = os.path.join(cache, name)
            if not os.path.exists(dst):
                shutil.copyfile(os.path.join(bundle, name), dst)
    except OSError:
        pass


def _migrate_legacy_cache(cache: str) -> None:
    """Adopt entries from the pre-0.2 cache directory (an early release
    briefly had a second knob writing ~/.cache/lambdaworks_kzg_tpu_jax;
    losing those entries costs minutes of TPU recompiles)."""
    import os

    legacy = os.path.join(
        os.path.expanduser("~"), ".cache", "lambdaworks_kzg_tpu_jax"
    )
    if not os.path.isdir(legacy):
        return
    try:
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        if not os.path.exists(cache):
            os.rename(legacy, cache)
        else:
            for name in os.listdir(legacy):
                dst = os.path.join(cache, name)
                if not os.path.exists(dst):
                    os.rename(os.path.join(legacy, name), dst)
            try:
                os.rmdir(legacy)
            except OSError:
                pass
    except OSError:
        pass


_configure_compile_cache()

from .constants import (
    BYTES_PER_BLOB,
    BYTES_PER_COMMITMENT,
    BYTES_PER_FIELD_ELEMENT,
    BYTES_PER_PROOF,
    FIELD_ELEMENTS_PER_BLOB,
)
from .models.eip4844 import EIP4844Context, KZGError
from .models.kzg import KZG, HostBackend
from .models.srs import (
    SetupLoadError,
    TrustedSetup,
    load_mainnet_setup,
    load_trusted_setup_file,
)
from .models.srs import load_trusted_setup_from_bytes as load_trusted_setup
from .utils.config import DEFAULT_CONFIG, KZGConfig

__version__ = "0.2.0"

__all__ = [
    "BYTES_PER_BLOB",
    "BYTES_PER_COMMITMENT",
    "BYTES_PER_FIELD_ELEMENT",
    "BYTES_PER_PROOF",
    "FIELD_ELEMENTS_PER_BLOB",
    "DEFAULT_CONFIG",
    "EIP4844Context",
    "KZG",
    "KZGConfig",
    "KZGError",
    "HostBackend",
    "SetupLoadError",
    "TrustedSetup",
    "load_mainnet_setup",
    "load_trusted_setup",
    "load_trusted_setup_file",
    "__version__",
]
