"""Montgomery Fp-mul kernel variants, timed in isolation on chip.

The madd kernel costs ~6 ns/lane per Fp-mul-equivalent; the vreg op
count predicts ~2 ns. This probes a chained x = mul(x, y) kernel in
several implementations to find the fast formulation:
  v1    — limbs on sublanes [24, B], place-add accumulate, KS carry
  v2    — limbs on leading axis [24, S, 128], same structure
  v2s   — v2 + slice-add accumulation (24-row adds instead of 48)
  v2t   — v2 + pairwise-tree accumulation of shifted partial products
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
CHAIN = int(os.environ.get('CHAIN', '32'))


def timeit(fn, iters=3):
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
    M = 8192

    # ---- v1 layout: [24, M] blocks of (24, 512) ----
    def chain_v1(consts_ref, x_ref, y_ref, o_ref):
        f = v1._KernelFp(consts_ref, x_ref.shape[-1])
        x = x_ref[:]
        y = y_ref[:]
        for _ in range(CHAIN):
            x = f.mul(x, y)
        o_ref[:] = x

    xv = jnp.asarray(rng.integers(0, 2**16, (L, M), dtype=np.uint32))
    yv = jnp.asarray(rng.integers(0, 2**16, (L, M), dtype=np.uint32))
    t_ = 512

    def run_v1(x, y):
        return pl.pallas_call(
            chain_v1,
            grid=(M // t_,),
            in_specs=[
                pl.BlockSpec((4, L), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((L, t_), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, t_), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, t_), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, M), jnp.uint32),
        )(jnp.asarray(v1._CONSTS), x, y)

    f = jax.jit(run_v1)
    t = timeit(lambda: f(xv, yv))
    print(f"v1  [24,{t_}] : {t*1e9/(CHAIN*M):.2f} ns/lane/mul", flush=True)

    # ---- v2 layout and variants ----
    def mk_v2(mul_fn):
        def chain(consts_ref, x_ref, y_ref, o_ref):
            fp = v2._KernelFp(consts_ref, x_ref.shape[-2:])
            x = x_ref[:, 0]
            y = y_ref[:, 0]
            for _ in range(CHAIN):
                x = mul_fn(fp, x, y)
            o_ref[:, 0] = x
        return chain

    x5 = xv.reshape(L, M // 1024, 8, 128)
    y5 = yv.reshape(L, M // 1024, 8, 128)

    def run_v2(chain, x, y):
        return pl.pallas_call(
            chain,
            grid=(M // 1024,),
            in_specs=[
                pl.BlockSpec((4, L), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((L, 1, 8, 128), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1, 8, 128), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, 1, 8, 128), lambda i: (0, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, M // 1024, 8, 128),
                                           jnp.uint32),
        )(jnp.asarray(v2._CONSTS), x, y)

    def mul_plain(fp, a, b):
        return fp.mul(a, b)

    # slice-add accumulate: 24-row adds + (free?) row concats
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
        la = a.shape[0]
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

    # pairwise-tree accumulation of the 24 shifted partial products
    def _mul_acc_tree(a, b, out_limbs):
        qs = []
        for j in range(b.shape[0]):
            p = a * b[j:j + 1]
            lo = p & MASK
            hi = p >> 16
            # q_j = lo + (hi << 16bits) as rows [25]
            q = jnp.concatenate([lo[:1], lo[1:] + hi[:-1], hi[-1:]], axis=0)
            qs.append((q, j))
        while len(qs) > 1:
            nxt = []
            for k in range(0, len(qs) - 1, 2):
                (qa, ja), (qb, jb) = qs[k], qs[k + 1]
                d = jb - ja
                # qa + (qb << d limbs): rows max(la, lb + d)
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

    variants = (("v2 ", mul_plain), ("v2s", mul_slice), ("v2t", mul_tree)) if os.environ.get("FULL") else ()
    for name, mul_fn in variants:
        fj = jax.jit(lambda x, y, c=mk_v2(mul_fn): run_v2(c, x, y))
        t = timeit(lambda: fj(x5, y5))
        print(f"{name} [24,8,128]: {t*1e9/(CHAIN*M):.2f} ns/lane/mul",
              flush=True)

    # sanity: v2 variants agree with v1 fp mul on one value
    from lambdaworks_kzg_tpu.ops.field_ops import FP
    ref = np.asarray(FP.mul(xv, yv))
    for name, mul_fn in ((("v2s", mul_slice), ("v2t", mul_tree)) if os.environ.get("FULL") else ()):
        def one(consts_ref, x_ref, y_ref, o_ref, mf=mul_fn):
            fp = v2._KernelFp(consts_ref, x_ref.shape[-2:])
            o_ref[:, 0] = mf(fp, x_ref[:, 0], y_ref[:, 0])
        got = pl.pallas_call(
            one,
            grid=(M // 1024,),
            in_specs=[
                pl.BlockSpec((4, L), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((L, 1, 8, 128), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1, 8, 128), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, 1, 8, 128), lambda i: (0, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, M // 1024, 8, 128),
                                           jnp.uint32),
        )(jnp.asarray(v2._CONSTS), x5, y5)
        ok = np.array_equal(np.asarray(got).reshape(L, M), ref)
        print(f"{name} parity vs field_ops: {ok}", flush=True)
        assert ok


if __name__ == "__main__":
    main()
