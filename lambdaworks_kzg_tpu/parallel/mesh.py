"""Device-mesh construction for the multi-chip tier.

The reference is single-threaded/single-process (SURVEY.md §2c); the TPU
framework makes its implicit parallelism axes explicit as a 2-axis mesh:

  * ``data``   — per-blob data parallelism (the batch loop at reference
                 src/lib.rs:562-596, run sequentially there)
  * ``points`` — intra-MSM parallelism: Pippenger points/buckets sharded
                 across chips (reference ``g1_lincomb`` src/lib.rs:241-243)

Collectives ride ICI inside a slice: per-device bucket/window sums are
``all_gather``-ed over ``points`` and tree-combined with Jacobian adds
(point addition is not `psum`-able — the reduction is a group op).
"""

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    points: Optional[int] = None,
) -> Mesh:
    """Build a (data, points) mesh over the given (default: all) devices.

    When the axis sizes are not given, favors the ``points`` axis: the MSM
    inner dimension (4096..2^22) has far more parallel slack than typical
    blob batch sizes, and the bucket combine is a cheap [3, L, W] gather.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None and points is None:
        data = 2 if n % 2 == 0 and n > 1 else 1
        points = n // data
    elif data is None:
        assert n % points == 0
        data = n // points
    elif points is None:
        assert n % data == 0
        points = n // data
    assert data * points <= n, f"{data}x{points} > {n} devices"
    arr = np.asarray(devices[: data * points]).reshape(data, points)
    return Mesh(arr, axis_names=("data", "points"))
