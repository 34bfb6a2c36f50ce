"""Multi-chip Pippenger MSM (shard_map over a jax.sharding.Mesh).

The distributed form of the flagship kernel (SURVEY.md §2b "first-class
distributed component", replacing the reference's single-threaded
``g1_lincomb`` / ``msm::pippenger::msm``, src/lib.rs:234-243):

  * points, validity mask and scalars are sharded over the ``points``
    mesh axis — each device runs the full single-chip bucket pipeline
    (ops/msm.py) on its point shard, producing window sums [3, L, W];
  * the W-lane window-sum arrays are ``all_gather``-ed over ``points``
    (tiny: 3*L*W u32 words) and tree-combined with log2(D) batched
    Jacobian adds — point addition is a group op, not a `psum`;
  * an optional ``data`` mesh axis shards a *batch* of scalar vectors
    (per-blob data parallelism: the batch loop the reference runs
    sequentially at src/lib.rs:562-596).

The final Horner window combine (255 sequential doublings) stays on the
host, as in the single-chip path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops import g1_ops as g1
from ..ops import msm as msm1

# jitted step cache: (mesh, c, kind) -> compiled-on-first-use callable.
# shard_map closures are rebuilt per call otherwise, defeating the jit cache.
_steps = {}


def _tree_fold_points(arr: jnp.ndarray) -> jnp.ndarray:
    """Fold [D, ..., 3, L, B] over the leading axis with Jacobian adds."""
    while arr.shape[0] > 1:
        half = arr.shape[0] // 2
        folded = g1.add(arr[:half], arr[half : 2 * half])
        if arr.shape[0] % 2:
            folded = jnp.concatenate([folded, arr[2 * half :]], axis=0)
        arr = folded
    return arr[0]


def _local_window_sums(points, valid, scalars, c: int,
                       scalar_bits: int = 255) -> jnp.ndarray:
    """Single-device Pippenger pipeline: shard -> window sums [3, L, W].

    Trip counts pmax-synced over the points axis (see
    ops/msm.bucket_accumulate_digits sync_axis)."""
    return msm1.bucket_reduce(
        msm1.bucket_accumulate(points, valid, scalars, c,
                               sync_axis="points",
                               scalar_bits=scalar_bits),
        c,
        scalar_bits=scalar_bits,
    )


# Below ~2^14 points per shard, Pippenger bucket loads are small enough
# that the max/mean skew (Binomial tail) makes point-sharding pay <70%
# efficiency (measured: 1.52x overhead at 2048-pt shards, ~5% at 2^17) —
# window-sharding has no such term, so "auto" switches on shard size.
_POINTS_SHARD_MIN = 1 << 14


def make_msm_step(mesh: Mesh, c: int = 8, shard: str = "points",
                  scalar_bits: int = 255):
    """Build (and cache) the jitted single-MSM multi-chip step.

    Step fn: (points[2, L, N], valid[N], scalars[16, N]) -> replicated
    window sums [3, L, W].

    shard="points": points/valid/scalars sharded over the ``points``
    axis; N must be divisible by the axis size. Wins at large N (the
    per-shard bucket skew term vanishes as shard loads grow).

    shard="windows": inputs replicated; each device runs the bucket
    pipeline for its ceil(W/D) Pippenger WINDOWS of the full point set.
    Per-device bucket loads equal the single-chip per-window loads, so
    there is NO small-shard skew — this is the protocol-shape (4096-pt
    commit) scaling mode. Communication: one all_gather of [3, L, W/D]
    window sums (a few KB).
    """
    key = (mesh, c, "single", shard, scalar_bits)
    if key in _steps:
        return _steps[key]

    if shard == "windows":
        step = _make_window_sharded_step(mesh, c, scalar_bits)
    else:

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P(None, None, "points"),
                P("points"),
                P(None, "points"),
            ),
            out_specs=P(),
            check_vma=False,
        )
        def step(pts, vld, scl):
            ws = _local_window_sums(pts, vld, scl, c, scalar_bits)
            all_ws = jax.lax.all_gather(ws, "points")  # [D, 3, L, W]
            return _tree_fold_points(all_ws)

    _steps[key] = jax.jit(step)
    return _steps[key]


def _make_window_sharded_step(mesh: Mesh, c: int, scalar_bits: int = 255):
    """Window-sharded MSM step body (see make_msm_step docstring)."""
    d_size = mesh.shape["points"]
    num_windows = msm1.num_windows(c, scalar_bits)
    wd = -(-num_windows // d_size)  # windows per device
    w_pad = wd * d_size

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    def step(pts, vld, scl):
        digits = msm1.prepare_digits(scl, vld, c, scalar_bits)  # [W, N]
        if w_pad != num_windows:
            digits = jnp.concatenate(
                [
                    digits,
                    jnp.zeros(
                        (w_pad - num_windows, digits.shape[1]), digits.dtype
                    ),
                ],
                axis=0,
            )
        d = jax.lax.axis_index("points")
        mine = jax.lax.dynamic_slice_in_dim(digits, d * wd, wd, axis=0)
        # sync_axis: all shards lockstep to the global max bucket load —
        # the gather below waits for the slowest shard anyway, and the
        # XLA CPU test mesh's rendezvous aborts on divergent trip counts
        buckets = msm1.bucket_accumulate_digits(
            pts, mine, c, sync_axis="points"
        )
        gw = d * wd + jnp.arange(wd)
        ws = msm1.bucket_reduce(buckets, c, top_mask=gw == num_windows - 1,
                                scalar_bits=scalar_bits)
        all_ws = jax.lax.all_gather(ws, "points")  # [D, 3, L, wd]
        full = jnp.transpose(all_ws, (1, 2, 0, 3)).reshape(
            3, ws.shape[1], w_pad
        )
        return full[..., :num_windows]

    return step


def sharded_msm_device(mesh: Mesh, points, valid, scalars, c: int = 8,
                       shard: str = "auto", scalar_bits: int = 255):
    """MSM sharded over the ``points`` mesh axis (by points or windows;
    "auto" picks windows when per-device point shards would fall under
    the skew knee, see _POINTS_SHARD_MIN)."""
    if shard == "auto":
        d = mesh.shape["points"]
        n = points.shape[-1]
        shard = "points" if n // d >= _POINTS_SHARD_MIN else "windows"
    return make_msm_step(mesh, c, shard, scalar_bits)(points, valid, scalars)


def sharded_msm(mesh: Mesh, points, valid, scalars, c: int = 8,
                shard: str = "auto", scalar_bits: int = 255):
    """Multi-chip MSM -> host Jacobian point (Python ints)."""
    ws = sharded_msm_device(mesh, points, valid, scalars, c, shard,
                            scalar_bits)
    return msm1.combine_windows_host(ws, c)


def make_batch_msm_step(mesh: Mesh, c: int = 8):
    """Build the jitted multi-chip *batch* MSM step (the framework's
    "training step" analog): a blob batch sharded over ``data``, MSM
    points sharded over ``points``.

    Returned fn: (points[2, L, N], valid[N], scalars[B, 16, N]) ->
    window sums [B, 3, L, W], batch sharded over ``data``. B must be
    divisible by the ``data`` axis size, N by the ``points`` axis size.
    """
    key = (mesh, c, "batch")
    if key in _steps:
        return _steps[key]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None, None, "points"),
            P("points"),
            P("data", None, "points"),
        ),
        out_specs=P("data"),
        check_vma=False,
    )
    def step(pts, vld, scl_batch):
        local = jax.vmap(lambda scl: _local_window_sums(pts, vld, scl, c))(
            scl_batch
        )  # [B_local, 3, L, W]
        all_ws = jax.lax.all_gather(local, "points")  # [D, B_local, 3, L, W]
        return _tree_fold_points(all_ws)

    _steps[key] = jax.jit(step)
    return _steps[key]


def batch_msm(mesh: Mesh, points, valid, scalars_batch, c: int = 8):
    """Multi-chip batch MSM -> list of host Jacobian points."""
    ws = make_batch_msm_step(mesh, c)(points, valid, scalars_batch)
    return [msm1.combine_windows_host(w, c) for w in ws]
