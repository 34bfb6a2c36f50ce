"""Multi-chip tier: device meshes + sharded kernels.

The reference library is single-process and single-threaded (SURVEY.md
§2c); this package supplies the explicit TPU parallelism it lacks —
per-blob data parallelism and intra-MSM point sharding over a
``jax.sharding.Mesh``, with collectives over ICI.
"""

from .mesh import make_mesh
from .msm import batch_msm, make_batch_msm_step, sharded_msm, sharded_msm_device

__all__ = [
    "make_mesh",
    "sharded_msm",
    "sharded_msm_device",
    "batch_msm",
    "make_batch_msm_step",
]
