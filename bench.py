"""End-of-round benchmark. Prints ONE JSON line.

Headline metric (BASELINE.json): blob_to_kzg_commitment ms/blob — one
4096-element blob against the full mainnet trusted setup (a single 2^12
Pippenger MSM) through the public API, on the default JAX backend (the
real TPU chip under the driver).

The reference publishes no numbers (BASELINE.md), so `vs_baseline` is the
speedup over this repo's exact host oracle (pure-Python-int Pippenger,
models/kzg.HostBackend) measured in the same process — the honest stand-in
for the reference's single-threaded CPU implementation.

Extra fields: msm_2e12_pps / msm_2e20_pps = MSM points/sec at 2^12 and
2^20 points (device kernel only, warm).
"""

import json
import os
import sys
import time

import numpy as np


def _rand_blob(n, rng):
    return b"".join(rng.bytes(31) + b"\x00" for _ in range(n))


def _time_best(fn, iters, *args):
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    return best


def _backend_ready():
    """Probe the accelerator; one retry (tunnel-attached chips flake —
    BENCH_r02.json died on a transient axon init error with no JSON)."""
    for attempt in (1, 2):
        try:
            import jax

            jax.devices()
            return jax.default_backend(), None
        except Exception as e:  # backend init error
            err = f"{type(e).__name__}: {e}"
            print(f"[bench] backend probe {attempt} failed: {err}",
                  file=sys.stderr)
            if attempt == 1:
                time.sleep(20)
    return None, err


def _host_fallback(error: str):
    """No accelerator: emit the host-oracle number so the round still
    records a real measurement (never rc!=0 without a JSON line)."""
    from lambdaworks_kzg_tpu.host import curve as HC
    from lambdaworks_kzg_tpu.models import srs
    from lambdaworks_kzg_tpu.models.kzg import HostBackend

    setup = srs.load_mainnet_setup()
    host = HostBackend(setup)
    rng = np.random.default_rng(42)
    blob = _rand_blob(setup.n, rng)
    evals = [
        int.from_bytes(blob[i * 32 : (i + 1) * 32], "little")
        for i in range(setup.n)
    ]
    t0 = time.perf_counter()
    pt = host.commit(evals)
    host_ms = (time.perf_counter() - t0) * 1e3
    HC.compress_g1(pt)
    return {
        "metric": "blob_to_kzg_commitment",
        "value": round(host_ms, 1),
        "unit": "ms/blob",
        "vs_baseline": 1.0,
        "baseline": "host-oracle (pure-Python Pippenger, same process)",
        "backend": "host-fallback",
        "error": f"accelerator unavailable: {error}",
    }


def main():
    backend_name, err = _backend_ready()
    if backend_name is None:
        print(json.dumps(_host_fallback(err)))
        return
    if backend_name not in ("tpu", "gpu"):
        print(json.dumps(_host_fallback(f"jax backend is {backend_name}")))
        return
    partial = {}
    try:
        result = _device_bench(partial)
    except Exception as e:  # emit whatever was measured before the failure
        import traceback

        traceback.print_exc()
        result = {
            "metric": "blob_to_kzg_commitment",
            "value": partial.get("value"),
            "unit": "ms/blob",
            "vs_baseline": partial.get("vs_baseline"),
            "backend": backend_name,
            **{k: v for k, v in partial.items()
               if k not in ("value", "vs_baseline")},
            "error": f"{type(e).__name__}: {e}",
        }
    print(json.dumps(result))


def _device_bench(partial):
    import jax
    import jax.numpy as jnp

    from lambdaworks_kzg_tpu.models import srs
    from lambdaworks_kzg_tpu.models.eip4844 import EIP4844Context
    from lambdaworks_kzg_tpu.models.kzg import HostBackend
    from lambdaworks_kzg_tpu.ops import codec, msm as msm1
    from lambdaworks_kzg_tpu.ops.backend import DeviceBackend

    print(f"[bench] jax backend: {jax.default_backend()}", file=sys.stderr)
    setup = srs.load_mainnet_setup()
    backend = DeviceBackend(setup)
    ctx = EIP4844Context(setup, backend=backend)

    rng = np.random.default_rng(42)
    blobs = [_rand_blob(setup.n, rng) for _ in range(4)]

    # -- headline: blob_to_kzg_commitment end-to-end -------------------------
    t0 = time.perf_counter()
    commitment = ctx.blob_to_kzg_commitment(blobs[0])  # compile + run
    compile_s = time.perf_counter() - t0
    print(f"[bench] first call (incl. compile): {compile_s:.1f}s", file=sys.stderr)

    iters = 5
    best = float("inf")
    for i in range(iters):
        t0 = time.perf_counter()
        ctx.blob_to_kzg_commitment(blobs[i % len(blobs)])
        best = min(best, time.perf_counter() - t0)
    device_ms = best * 1e3
    partial["value"] = round(device_ms, 3)
    partial["compile_s"] = round(compile_s, 1)

    # pipelined throughput: dispatch 16 commit MSMs async (through the
    # production path — fixed-base tables when built), block once (the
    # dev chip sits behind a ~40ms RTT tunnel; serving pipelines)
    dls = [
        jnp.asarray(codec.blob_to_limbs(_rand_blob(setup.n, rng), setup.n))
        for _ in range(16)
    ]
    t0 = time.perf_counter()
    outs = [backend._srs_msm_dispatch(d) for d in dls]
    jax.block_until_ready(outs)
    pipelined_ms = (time.perf_counter() - t0) / 16 * 1e3

    # -- baseline: exact host oracle (pure Python ints), one run -------------
    host = HostBackend(setup)
    evals = [
        int.from_bytes(blobs[0][i * 32 : (i + 1) * 32], "little")
        for i in range(setup.n)
    ]
    t0 = time.perf_counter()
    host_pt = host.commit(evals)
    host_ms = (time.perf_counter() - t0) * 1e3
    partial["vs_baseline"] = round(host_ms / device_ms, 2)
    partial["baseline_ms"] = round(host_ms, 1)
    from lambdaworks_kzg_tpu.host import curve as HC

    assert HC.compress_g1(host_pt) == commitment, "device/host mismatch"

    # -- verify paths (native pairing + device batch pipeline) ---------------
    extras = partial  # progressive: survives a mid-bench failure
    if os.environ.get("BENCH_SKIP_VERIFY") != "1":
        proof = ctx.compute_blob_kzg_proof(blobs[0], commitment)
        assert ctx.verify_blob_kzg_proof(blobs[0], commitment, proof)
        extras["verify_blob_ms"] = round(
            _time_best(
                lambda: ctx.verify_blob_kzg_proof(blobs[0], commitment, proof),
                3,
            )
            * 1e3,
            1,
        )
        vb = [_rand_blob(setup.n, rng) for _ in range(16)]
        vcs = ctx.blob_to_kzg_commitment_batch(vb)
        vps = [ctx.compute_blob_kzg_proof(b, c) for b, c in zip(vb, vcs)]
        assert ctx.verify_blob_kzg_proof_batch(vb, vcs, vps)
        extras["batch16_verify_ms_per_blob"] = round(
            _time_best(
                lambda: ctx.verify_blob_kzg_proof_batch(vb, vcs, vps), 2
            )
            / 16
            * 1e3,
            2,
        )

    # -- MSM points/sec at 2^12 and 2^20 (device kernel, warm) ---------------
    # 2^12 measured PIPELINED (16 async dispatches, one sync): the sync
    # latency at this size is dominated by the ~40ms tunnel RTT, not the
    # kernel (round-1 bench under-reported it 3x). Routed through the
    # AOT program cache (ops/aot.py) like the production dispatch, so a
    # fresh driver box skips the minutes-long Pallas lowering when the
    # repo ships artifacts for these shapes.
    from lambdaworks_kzg_tpu.ops import aot

    def run_msm(pts, vld, scl, c, sb=255):
        return aot.call(
            "msm_device",
            msm1.msm_device,
            (pts, vld, scl),
            static=(("c", c), ("scalar_bits", sb)),
        )

    points, valid = backend.points, backend.valid
    scalars = jnp.asarray(codec.blob_to_limbs(blobs[1], setup.n))
    jax.block_until_ready(run_msm(points, valid, scalars, backend.c))
    t0 = time.perf_counter()
    outs = [
        run_msm(points, valid, d, backend.c) for d in dls
    ]
    jax.block_until_ready(outs)
    extras["msm_2e12_pps"] = round(setup.n * 16 / (time.perf_counter() - t0))
    extras["fixed_base"] = backend._fb is not None

    if os.environ.get("BENCH_SKIP_2E20") != "1":
        n_big = 1 << 20
        reps = n_big // setup.n
        big_pts = jnp.tile(points, (1, 1, reps))
        big_valid = jnp.tile(valid, (reps,))
        # Standard MSM distribution: uniform 255-bit scalars (every Fr
        # window uniformly loaded — what external MSM benchmarks and the
        # host oracle's own workload look like). NOT tiled 31-byte blob
        # limbs: those are < 2^248, which starves the window straddling
        # bit 248 of entropy and concentrates its load 16x at c=12 (the
        # round-3/4 driver-bench c=12 collapse, ~2x); packed data is the
        # separate scalar_bits=248 measurement below.
        big_scalars = jnp.asarray(
            np.concatenate(
                [
                    rng.integers(0, 1 << 16, (15, n_big), dtype=np.uint32),
                    rng.integers(0, 1 << 15, (1, n_big), dtype=np.uint32),
                ],
                axis=0,
            )
        )
        # window-size sweep: the generalized top-window alias split makes
        # non-dividing c viable; larger c trades fewer gathers/madds
        # (W = ceil(256/c) windows) for per-window bucket-load skew
        for c_big in (8, 12):
            run_big = lambda cb=c_big: jax.block_until_ready(
                run_msm(big_pts, big_valid, big_scalars, cb)
            )
            try:
                t0 = time.perf_counter()
                run_big()
                print(
                    f"[bench] 2^20 c={c_big} first call: "
                    f"{time.perf_counter() - t0:.1f}s",
                    file=sys.stderr,
                )
                pps = round((1 << 20) / _time_best(run_big, 2))
                print(f"[bench] 2^20 c={c_big}: {pps} pts/s", file=sys.stderr)
                if pps > extras.get("msm_2e20_pps", 0):
                    extras["msm_2e20_pps"] = pps
                    extras["msm_2e20_c"] = c_big
            except Exception as e:  # OOM/compile failure must not kill bench
                print(f"[bench] 2^20 c={c_big} skipped: {e}", file=sys.stderr)

        # 31-byte-packed workload (what rollup blob data actually is):
        # 248-bit scalars through the static scalar_bits=248 kernel —
        # one window fewer and an alias-split top window AT the entropy
        # boundary, so c=12 keeps its uniform-load shape.
        packed_scalars = jnp.asarray(
            np.concatenate(
                [
                    codec.blob_to_limbs(_rand_blob(setup.n, rng), setup.n)
                    for _ in range(reps)
                ],
                axis=1,
            )
        )
        run_packed = lambda: jax.block_until_ready(
            run_msm(big_pts, big_valid, packed_scalars, 12, 248)
        )
        try:
            t0 = time.perf_counter()
            run_packed()
            print(
                f"[bench] 2^20 c=12 packed-248 first call: "
                f"{time.perf_counter() - t0:.1f}s",
                file=sys.stderr,
            )
            pps = round((1 << 20) / _time_best(run_packed, 2))
            print(f"[bench] 2^20 c=12 packed-248: {pps} pts/s", file=sys.stderr)
            extras["msm_2e20_packed248_pps"] = pps
        except Exception as e:
            print(f"[bench] 2^20 packed-248 skipped: {e}", file=sys.stderr)

    result = {
        "metric": "blob_to_kzg_commitment",
        "value": round(device_ms, 3),
        "unit": "ms/blob",
        "vs_baseline": round(host_ms / device_ms, 2),
        "baseline": "host-oracle (pure-Python Pippenger, same process)",
        "baseline_ms": round(host_ms, 1),
        "backend": jax.default_backend(),
        "pipelined_ms_per_blob": round(pipelined_ms, 2),
        **{k: v for k, v in extras.items()
           if k not in ("value", "vs_baseline", "baseline_ms")},
    }
    return result


if __name__ == "__main__":
    main()
