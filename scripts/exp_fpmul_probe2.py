"""True per-mul kernel rates via delta timing (K vs 2K in-kernel loops).

Every host->device dispatch costs ~29 ms on this tunnel-attached chip,
so small absolute timings are meaningless; t(2K) - t(K) isolates K muls
of pure kernel time. Variants as in exp_fpmul_probe.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 24
MASK = 0xFFFF
K = 256
M = 8192


def timeit(fn, iters=5):
    jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import lambdaworks_kzg_tpu  # noqa: F401
    from lambdaworks_kzg_tpu.ops import pallas_g1 as v1
    from lambdaworks_kzg_tpu.ops import pallas_g1_v2 as v2
    rng = np.random.default_rng(0)
    xv = jnp.asarray(rng.integers(0, 2**16, (L, M), dtype=np.uint32))
    yv = jnp.asarray(rng.integers(0, 2**16, (L, M), dtype=np.uint32))

    def delta_rate(make_kernel, x, y, specs, out_spec, out_shape, consts):
        ts = []
        for reps in (K, 2 * K):
            kern = make_kernel(reps)
            fj = jax.jit(lambda a, b: pl.pallas_call(
                kern,
                grid=(specs["grid"],),
                in_specs=specs["in"],
                out_specs=out_spec,
                out_shape=out_shape,
            )(consts, a, b))
            ts.append(timeit(lambda: fj(x, y)))
        return (ts[1] - ts[0]) / (K * M)  # s per lane-mul

    # ---- v1 [24, 512] ----
    def mk_v1(reps):
        def kern(consts_ref, x_ref, y_ref, o_ref):
            f = v1._KernelFp(consts_ref, x_ref.shape[-1])
            y = y_ref[:]

            def body(i, x):
                return f.mul(x, y)

            o_ref[:] = jax.lax.fori_loop(0, reps, body, x_ref[:])
        return kern

    t_ = 512
    specs = {
        "grid": M // t_,
        "in": [
            pl.BlockSpec((4, L), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((L, t_), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, t_), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
    }
    r = delta_rate(
        mk_v1, xv, yv, specs,
        pl.BlockSpec((L, t_), lambda i: (0, i), memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((L, M), jnp.uint32),
        jnp.asarray(v1._CONSTS),
    )
    print(f"v1  [24,512]  : {r*1e9:.2f} ns/lane/mul", flush=True)

    # ---- v2 variants [24, 8, 128] ----
    x5 = xv.reshape(L, M // 1024, 8, 128)
    y5 = yv.reshape(L, M // 1024, 8, 128)
    specs2 = {
        "grid": M // 1024,
        "in": [
            pl.BlockSpec((4, L), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((L, 1, 8, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, 8, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    }
    out_spec2 = pl.BlockSpec((L, 1, 8, 128), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape2 = jax.ShapeDtypeStruct((L, M // 1024, 8, 128), jnp.uint32)

    def mk_v2(mul_fn):
        def make(reps):
            def kern(consts_ref, x_ref, y_ref, o_ref):
                fp = v2._KernelFp(consts_ref, x_ref.shape[-2:])
                y = y_ref[:, 0]

                def body(i, x):
                    return mul_fn(fp, x, y)

                o_ref[:, 0] = jax.lax.fori_loop(0, reps, body, x_ref[:, 0])
            return kern
        return make

    def mul_plain(fp, a, b):
        return fp.mul(a, b)

    def _slice_add(acc, x, off):
        n = x.shape[0]
        parts = []
        if off:
            parts.append(acc[:off])
        parts.append(acc[off:off + n] + x)
        if off + n < acc.shape[0]:
            parts.append(acc[off + n:])
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    def _mul_acc_slice(a, b, out_limbs):
        acc = jnp.zeros((out_limbs,) + a.shape[1:], dtype=jnp.uint32)
        for j in range(b.shape[0]):
            p = a * b[j:j + 1]
            acc = _slice_add(acc, p & MASK, j)
            acc = _slice_add(acc, p >> 16, j + 1)
        return v2._carry(acc)

    def _mul_acc_slice_const(a, scs, out_limbs):
        acc = jnp.zeros((out_limbs,) + a.shape[1:], dtype=jnp.uint32)
        for j, cj in enumerate(scs):
            p = a * cj.astype(jnp.uint32)
            take = min(a.shape[0], out_limbs - j)
            acc = _slice_add(acc, (p & MASK)[:take], j)
            take = min(a.shape[0], out_limbs - j - 1)
            if take > 0:
                acc = _slice_add(acc, (p >> 16)[:take], j + 1)
        return v2._carry(acc)

    def mul_slice(fp, a, b):
        t = _mul_acc_slice(a, b, 2 * L)
        m = _mul_acc_slice_const(t[:L], fp.np_sc, L)
        mn = _mul_acc_slice_const(m, fp.n_sc, 2 * L)
        u = v2._carry(t + mn)
        return fp._sub_n_if_ge(u[L:])

    def _mul_acc_tree(a, b, out_limbs):
        qs = []
        for j in range(b.shape[0]):
            p = a * b[j:j + 1]
            lo = p & MASK
            hi = p >> 16
            q = jnp.concatenate([lo[:1], lo[1:] + hi[:-1], hi[-1:]], axis=0)
            qs.append((q, j))
        while len(qs) > 1:
            nxt = []
            for k in range(0, len(qs) - 1, 2):
                (qa, ja), (qb, jb) = qs[k], qs[k + 1]
                d = jb - ja
                la, lb = qa.shape[0], qb.shape[0]
                rows = max(la, lb + d)
                qa_p = v2._place(qa, 0, rows)
                qb_p = v2._place(qb, d, rows)
                nxt.append((qa_p + qb_p, ja))
            if len(qs) % 2:
                nxt.append(qs[-1])
            qs = nxt
        return v2._carry(v2._place(qs[0][0], 0, out_limbs))

    def mul_tree(fp, a, b):
        t = _mul_acc_tree(a, b, 2 * L)
        m = _mul_acc_slice_const(t[:L], fp.np_sc, L)
        mn = _mul_acc_slice_const(m, fp.n_sc, 2 * L)
        u = v2._carry(t + mn)
        return fp._sub_n_if_ge(u[L:])

    def mul_nosub(fp, a, b):
        t = v2._mul_acc(a, b, 2 * L)
        m = v2._mul_acc_const(t[:L], fp.np_sc, L)
        mn = v2._mul_acc_const(m, fp.n_sc, 2 * L)
        u = v2._carry(t + mn)
        return u[L:]

    for name, fn in (("v2 ", mul_plain), ("v2s", mul_slice),
                     ("v2t", mul_tree), ("v2n", mul_nosub)):
        r = delta_rate(mk_v2(fn), x5, y5, specs2, out_spec2, out_shape2,
                       jnp.asarray(v2._CONSTS))
        print(f"{name} [24,8,128]: {r*1e9:.2f} ns/lane/mul", flush=True)


if __name__ == "__main__":
    main()
