"""Multi-chip tier: device meshes + sharded kernels.

The reference library is single-process and single-threaded (SURVEY.md
§2c); this package supplies the explicit TPU parallelism it lacks —
per-blob data parallelism and intra-MSM point sharding over a
``jax.sharding.Mesh``, with collectives over ICI.

Exports resolve lazily (PEP 562): the kernel modules build device
constants at import, which would initialize the XLA backend — that must
not happen before ``parallel.distributed.initialize()`` in multi-host
processes.
"""

from importlib import import_module

_EXPORTS = {
    "make_mesh": ".mesh",
    "sharded_msm": ".msm",
    "sharded_msm_device": ".msm",
    "batch_msm": ".msm",
    "make_batch_msm_step": ".msm",
}

__all__ = list(_EXPORTS) + ["distributed"]


def __getattr__(name):
    if name in _EXPORTS:
        return getattr(import_module(_EXPORTS[name], __name__), name)
    if name == "distributed":
        return import_module(".distributed", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
