"""Multi-chip NTT over Fr: the 4-step transpose algorithm on a mesh axis.

The distributed form of the FFT subsystem the reference never built
(SURVEY.md §5 "long context" analog; reference src/lib.rs:760-770). For
n = D * n2 on a D-device mesh axis, with j = j1 + D*j2 and
k = k2 + n2*k1:

  X[k2 + n2*k1] = NTT_D over j1 [ w^(j1*k2) * NTT_n2 over j2 [ x ] ]

  1. inner NTTs (size n2) run device-local on each row shard;
  2. the twiddle plane w^(j1*k2) multiplies elementwise (local);
  3. ONE all_to_all over ICI re-shards columns for the outer stage —
     the only communication in the whole transform;
  4. outer NTTs (size D) run local, batched over the column shard.

Input/output are natural-order [16, n] arrays (same semantics as
host/fft.fr_fft and ops/ntt.ntt_device); output is gathered replicated.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..constants import R, fr_root_of_unity
from ..ops import ntt as ntt1
from ..ops.field_ops import FR

_steps = {}


def _twiddle_rows(n: int, d: int, inverse: bool) -> np.ndarray:
    """[d, 16, n2] Montgomery plane: row j1, column k2 -> w^(j1*k2)."""
    n2 = n // d
    w = fr_root_of_unity(n)
    if inverse:
        w = pow(w, R - 2, R)
    rows = []
    for j1 in range(d):
        wj = pow(w, j1, R)
        vals, acc = [], 1
        for _ in range(n2):
            vals.append(acc)
            acc = acc * wj % R
        rows.append(FR.to_mont_host(vals))
    return np.stack(rows)  # [d, 16, n2]


def make_ntt_step(mesh: Mesh, axis: str, n: int, inverse: bool = False):
    """Build (and cache) the jitted multi-chip NTT step: [16, n] -> [16, n].

    The input is split j = j1 + D*j2 with j1 the device index, so the
    device shard is x[:, j1::D] — a strided row of the [D, n2] view.
    """
    key = (mesh, axis, n, inverse)
    if key in _steps:
        return _steps[key]

    d = mesh.shape[axis]
    n2 = n // d
    assert n2 * d == n and n2 % d == 0, "n must be divisible by D^2"
    tw = jnp.asarray(_twiddle_rows(n, d, inverse))
    n_inv = jnp.asarray(FR.to_mont_host([pow(n, R - 2, R)]))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None),),
        out_specs=P(None, None),
        check_vma=False,
    )
    def step(x):  # x replicated [16, n]
        j1 = jax.lax.axis_index(axis)
        # local strided row: x[:, j1::D] (element j1 + D*j2 sits at
        # reshape(16, n2, D)[:, j2, j1])
        mine = jnp.take(x.reshape(16, n2, d), j1, axis=-1)  # [16, n2]
        # 1. inner NTT (size n2), no 1/n2 scaling (applied globally)
        inner = ntt1.ntt_device(mine, inverse=inverse, scale=False)
        # 2. twiddle w^(j1*k2)
        tw_mine = jnp.take(tw, j1, axis=0)  # [16, n2]
        twiddled = FR.mul(inner, tw_mine)
        # 3. re-shard columns: split k2 into D chunks, all_to_all over ICI
        chunks = twiddled.reshape(16, d, n2 // d)  # [16, D, n2/D]
        exchanged = jax.lax.all_to_all(
            chunks, axis, split_axis=1, concat_axis=1, tiled=False
        )  # exchanged[:, j1', m] = B'[j1'][my_chunk_base + m]
        # 4. outer NTT (size D) over j1, batched over the column shard:
        # rearrange to [n2/D, 16, D] (leading batch, limbs, transform axis)
        arr = jnp.transpose(exchanged, (2, 0, 1))  # [n2/D, 16, D]
        outer = ntt1.ntt_device(arr, inverse=inverse, scale=False)
        if inverse:
            outer = FR.mul(outer, jnp.broadcast_to(n_inv, outer.shape))
        # outer[m, :, k1] = X[k2 + n2*k1] with k2 = my_chunk_base + m
        # assemble the replicated output: gather every device's block
        block = jnp.transpose(outer, (1, 2, 0))  # [16, D(k1), n2/D(m)]
        allb = jax.lax.all_gather(block, axis)  # [D(dev), 16, D, n2/D]
        # device dev holds k2 chunk dev: X[k2=dev*(n2/D)+m + n2*k1]
        out = jnp.transpose(allb, (1, 2, 0, 3))  # [16, D(k1), D(dev), n2/D]
        return out.reshape(16, n)

    _steps[key] = jax.jit(step)
    return _steps[key]


def sharded_ntt(mesh: Mesh, axis: str, x_mont, inverse: bool = False):
    """Natural-order multi-chip NTT of [16, n] Montgomery limbs."""
    n = x_mont.shape[-1]
    return make_ntt_step(mesh, axis, n, inverse)(x_mont)


def sharded_ntt_ints(mesh: Mesh, axis: str, values, inverse: bool = False):
    """Host ints -> host ints (oracle-compat convenience)."""
    x = jnp.asarray(FR.to_mont_host([v % R for v in values]))
    y = sharded_ntt(mesh, axis, x, inverse=inverse)
    return FR.from_mont_host(np.asarray(y))
