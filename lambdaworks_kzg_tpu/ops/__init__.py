"""Device (JAX/XLA/Pallas) kernel tier.

Importing this package enables JAX's persistent compilation cache (the
limb-arithmetic kernels are large graphs; caching amortizes compiles
across processes). Opt out with LAMBDAWORKS_KZG_TPU_NO_COMPILE_CACHE=1.
"""

import os

if not os.environ.get("LAMBDAWORKS_KZG_TPU_NO_COMPILE_CACHE"):
    import jax

    _cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "lambdaworks_kzg_tpu_jax"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
