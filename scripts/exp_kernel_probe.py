"""Raw in-kernel op-rate probes (Mosaic on the real chip).

Answers, for the madd-kernel redesign: what do u32 multiply, u32 add,
f32 multiply, and a bf16 MXU matmul actually cost per [24, B] limb-plane
op inside a Pallas kernel? The madd kernel measures 66.8 ns/lane; its
op-count model predicts ~15 ns/lane at full-rate int ops — this probe
locates the gap (int-multiply throughput is the prime suspect).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 512
ROWS = 24
K = 256  # chained ops per kernel invocation


def timeit(fn, iters=5):
    jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def _mk(kernel, x, grid_m):
    return pl.pallas_call(
        kernel,
        grid=(grid_m,),
        in_specs=[pl.BlockSpec((ROWS, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )


def k_u32mul(x_ref, o_ref):
    x = x_ref[:]
    y = x | jnp.uint32(1)
    for _ in range(K):
        x = (x * y) & jnp.uint32(0xFFFF)
        x = x + jnp.uint32(3)
    o_ref[:] = x


def k_u32add(x_ref, o_ref):
    x = x_ref[:]
    y = x | jnp.uint32(1)
    for _ in range(K):
        x = (x + y) & jnp.uint32(0xFFFF)
        x = x ^ jnp.uint32(5)
    o_ref[:] = x


def k_f32mul(x_ref, o_ref):
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32)
    y = x + 1.5
    for _ in range(K):
        x = x * y
        x = x - jnp.floor(x * 0.5)  # keep bounded
    o_ref[:] = x.astype(jnp.int32).astype(jnp.uint32)


def k_u16mul(x_ref, o_ref):
    # does Mosaic run 16-bit int multiplies at 2x? (packed ops)
    x = x_ref[:].astype(jnp.uint16)
    y = x | jnp.uint16(1)
    for _ in range(K):
        x = x * y
        x = x + jnp.uint16(3)
    o_ref[:] = x.astype(jnp.uint32)


def k_shift(x_ref, o_ref):
    x = x_ref[:]
    for _ in range(K):
        x = (x >> 16) | ((x & jnp.uint32(0xFFFF)) << 16)
        x = x + jnp.uint32(1)
    o_ref[:] = x


def main():
    import lambdaworks_kzg_tpu  # noqa: F401
    rng = np.random.default_rng(0)
    m = 16  # grid steps
    x = jnp.asarray(
        rng.integers(0, 2**16, (ROWS, B * m), dtype=np.uint32))
    lanes = ROWS * B * m

    for name, kern, ops_per in [
        ("u32_mul+and+add", k_u32mul, 3),
        ("u32_add+and+xor", k_u32add, 3),
        ("f32_mul+sub+floor+mul", k_f32mul, 4),
        ("u32_shift_mix", k_shift, 4),
    ]:
        f = jax.jit(lambda xx, kk=kern: _mk(kk, xx, m)(xx))
        t = timeit(lambda: f(x))
        tot = lanes * K * ops_per
        print(f"{name}: {t*1e3:.2f} ms -> {tot/t/1e9:.0f} G lane-ops/s "
              f"({t*1e9/(K*lanes):.3f} ns/lane/iter)")

    # MXU probe: bf16 [48,48] @ [48,B] inside a kernel, K2 chained
    K2 = 64
    A = jnp.asarray(rng.integers(0, 256, (48, 48)), dtype=jnp.bfloat16)

    def k_mxu(a_ref, x_ref, o_ref):
        a = a_ref[:]
        x = x_ref[:]
        for _ in range(K2):
            y = jax.lax.dot_general(
                a, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            x = (y - 256.0 * jnp.floor(y * (1.0 / 256.0))).astype(jnp.bfloat16)
        o_ref[:] = x.astype(jnp.float32)

    xb = jnp.asarray(rng.integers(0, 256, (48, B * m)), dtype=jnp.bfloat16)
    f = jax.jit(lambda aa, xx: pl.pallas_call(
        k_mxu,
        grid=(m,),
        in_specs=[
            pl.BlockSpec((48, 48), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((48, B), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((48, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((48, B * m), jnp.float32),
    )(aa, xx))
    t = timeit(lambda: f(A, xb))
    macs = 48 * 48 * B * m * K2
    print(f"mxu_bf16_48x48: {t*1e3:.2f} ms -> {macs/t/1e12:.2f} T MAC/s "
          f"({t*1e9/(K2*B*m):.2f} ns per [48,48]@[48]col)")


if __name__ == "__main__":
    main()
