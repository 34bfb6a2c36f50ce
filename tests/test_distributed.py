"""Multi-host (jax.distributed) path executed for real: two localhost
CPU processes, one global mesh, one sharded commit MSM — bit-identical
to the host oracle in every process.

SURVEY.md §2c "communication backend": the reference has no distributed
code at all; this is the TPU framework's DCN tier. Round 2 shipped
parallel/distributed.py with zero executed coverage (VERDICT.md missing
#3) — this test launches 2 real processes with 1 virtual CPU device
each, so the ``points`` mesh axis (and its window-sum all_gather)
genuinely crosses the process boundary.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # 2 subprocesses x XLA CPU compiles

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=1"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
# share the repo test compile cache (same as tests/conftest.py)
jax.config.update("jax_compilation_cache_dir", sys.argv[4])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# initialize the cluster BEFORE importing the library: module-level
# device constants (ops/field_ops) would otherwise initialize the XLA
# backend and jax.distributed refuses to start afterwards
from lambdaworks_kzg_tpu.parallel import distributed

coord, num, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
assert distributed.initialize(coord, num, pid) is True
assert distributed.is_initialized()
assert jax.process_count() == num

import random
from lambdaworks_kzg_tpu.constants import R
from lambdaworks_kzg_tpu.host import curve as HC
from lambdaworks_kzg_tpu.models import srs
from lambdaworks_kzg_tpu.ops import g1_ops, msm as msm1
from lambdaworks_kzg_tpu.parallel import sharded_msm

# points axis spans BOTH processes: the all_gather crosses the
# process boundary (the DCN analog on localhost CPU)
mesh = distributed.global_mesh(data=1, points=num)
assert mesh.devices.shape == (1, num)

N, C = 16, 1
setup = srs.create_dev_setup(N, secret=0xD15C0)
points, valid = g1_ops.make_points_host(setup.g1_lagrange_brp)
rng = random.Random(77)
scalar_ints = [rng.randrange(R) for _ in range(N)]
got = sharded_msm(mesh, points, valid, msm1.scalars_to_device(scalar_ints), c=C)
expected = HC.g1_msm(scalar_ints, setup.g1_lagrange_brp)
assert HC.points_eq(HC.FP_OPS, got, expected), "distributed MSM != host oracle"
print(f"[worker {pid}] distributed commit MSM matches host oracle")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_msm(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = os.path.join(repo, ".jax_cache")
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    coord = f"localhost:{_free_port()}"
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")
    }
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, "2", str(pid), cache],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1200)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "matches host oracle" in out
