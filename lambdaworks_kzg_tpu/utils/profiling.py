"""Kernel timing + roofline reporting (SURVEY.md §5 "tracing/profiling").

The reference ships no instrumentation at all (no timers, no logging —
SURVEY.md §5). Here: wall-clock kernel timing with dispatch-pipeline
amortization (the dev TPU sits behind a ~40 ms RTT tunnel, so sync
latency lies), plus a roofline table for the limb kernels against a VPU
speed-of-light model.

Use `python -m lambdaworks_kzg_tpu.utils.profiling` on a TPU host to
print the table (written to BENCH_ROOFLINE.md by bench.py --roofline).
"""

import time
from dataclasses import dataclass
from typing import Callable, List

import jax


def time_pipelined(fn: Callable[[], object], iters: int = 10) -> float:
    """Seconds per call, amortizing dispatch latency over `iters` async
    dispatches (block once at the end)."""
    fn()  # warm / compile
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def time_chained(step: Callable, x0, iters: int = 64) -> float:
    """Seconds per application of `step`, measured as one jitted
    fori_loop of data-dependent applications — immune to the dispatch
    RTT of a tunnel-attached chip (the honest in-loop kernel cost)."""
    import jax.lax as lax

    @jax.jit
    def run(x):
        return lax.fori_loop(0, iters, lambda i, v: step(v), x)

    jax.block_until_ready(run(x0))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(run(x0))
    return (time.perf_counter() - t0) / iters


@dataclass
class KernelStat:
    name: str
    lanes: int
    seconds: float
    field_muls_per_lane: float  # Montgomery muls each lane performs

    @property
    def ns_per_lane(self) -> float:
        return self.seconds / self.lanes * 1e9

    @property
    def fp_mul_rate(self) -> float:
        """Montgomery multiplies per second achieved."""
        return self.lanes * self.field_muls_per_lane / self.seconds


# VPU speed-of-light model for one fused Montgomery Fp multiply
# (radix-2^16, 24 limbs): 3 schoolbook passes = 3*24*24 u32 multiplies
# plus ~2x that in masks/adds/carries ~= 5200 vector ops per lane.
# A v5e-class core retires ~4 * 8 * 128 = 4096 int lanes/cycle at
# ~940 MHz => ~3.85e12 lane-ops/s => ~1.35 ns/lane per Fp mul.
SOL_FP_MUL_NS = 5200 / (4 * 8 * 128 * 0.94e9) * 1e9


def roofline_table(stats: List[KernelStat]) -> str:
    lines = [
        "| kernel | lanes | ns/lane | Fp-mul/s | % of VPU speed-of-light |",
        "|---|---|---|---|---|",
    ]
    for s in stats:
        sol = SOL_FP_MUL_NS * s.field_muls_per_lane
        pct = 100.0 * sol / s.ns_per_lane if s.ns_per_lane else 0.0
        lines.append(
            f"| {s.name} | {s.lanes} | {s.ns_per_lane:.0f} | "
            f"{s.fp_mul_rate:.2e} | {pct:.0f}% |"
        )
    return "\n".join(lines)


def collect_kernel_stats(lanes: int = 8192) -> List[KernelStat]:
    """Benchmark the core point kernels at the MSM's working lane count."""
    import jax.numpy as jnp
    import numpy as np

    from ..models import srs
    from ..ops import dispatch as D
    from ..ops import g1_ops
    from ..ops.field_ops import FP

    setup = srs.create_dev_setup(64, secret=0xBEEF)
    aff, valid = g1_ops.make_points_host(setup.g1_lagrange_brp)
    reps = lanes // 64
    aff_b = jnp.tile(aff, (1, 1, reps))
    valid_b = jnp.tile(valid, (reps,))
    inf = g1_ops.infinity_like((), lanes)
    p = D.madd(inf, aff_b, valid_b)
    q = D.dbl(p)

    stats = [
        KernelStat(
            "g1_madd (Jacobian+affine)",
            lanes,
            time_chained(lambda v: D.madd(v, aff_b, valid_b), p),
            13.0,
        ),
        KernelStat(
            "g1_add (Jacobian+Jacobian)",
            lanes,
            time_chained(lambda v: D.add(v, q), p),
            17.0,
        ),
        KernelStat("g1_dbl", lanes, time_chained(D.dbl, p), 9.0),
        KernelStat(
            "fp_mul (XLA tier)",
            lanes,
            time_chained(lambda v: FP.mul(v, q[0]), p[0]),
            1.0,
        ),
    ]
    return stats


if __name__ == "__main__":
    print(roofline_table(collect_kernel_stats()))
