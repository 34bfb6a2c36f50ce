"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4 "multi-node testing"). Must run
before the first `import jax` anywhere in the test session.

LWKZG_TEST_PLATFORM=tpu runs the suite on the real accelerator instead
(hardware evidence runs, e.g. the full consensus-vector gate on chip —
testdata/FULL_GATE_*.txt); mesh-shaped tests then skip if fewer than 8
devices exist.
"""

import os

_ON_TPU = os.environ.get("LWKZG_TEST_PLATFORM") == "tpu"
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    # neutralize any TPU plugin auto-registration (axon sitecustomize)
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the limb-arithmetic graphs compile slowly on
# the CPU backend; cache hits make repeated pytest runs fast.
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if _ON_TPU and len(jax.devices()) < 8:
        skip = pytest.mark.skip(
            reason="mesh-shaped test: needs the 8-device virtual CPU run"
        )
        for it in items:
            if any(
                k in it.nodeid
                for k in ("parallel", "mesh", "distributed", "ntt_sharded")
            ):
                it.add_marker(skip)

# Consensus-spec vectors: the repo bundles them (testdata/consensus, the
# standalone bit-exactness gate); a reference mount is a fallback only.
_BUNDLED_TESTS = os.path.join(
    os.path.dirname(__file__), "..", "testdata", "consensus"
)
REFERENCE_TESTS = (
    _BUNDLED_TESTS if os.path.isdir(_BUNDLED_TESTS) else "/root/reference/tests"
)


def reference_vectors_available() -> bool:
    return os.path.isdir(REFERENCE_TESTS)


@pytest.fixture(scope="session")
def mainnet_setup():
    from lambdaworks_kzg_tpu.models import srs

    return srs.load_mainnet_setup()


@pytest.fixture(scope="session")
def host_ctx(mainnet_setup):
    from lambdaworks_kzg_tpu.models.eip4844 import EIP4844Context
    from lambdaworks_kzg_tpu.models.kzg import HostBackend

    return EIP4844Context(mainnet_setup, backend=HostBackend(mainnet_setup))


@pytest.fixture(scope="session")
def device_ctx(mainnet_setup):
    from lambdaworks_kzg_tpu.models.eip4844 import EIP4844Context
    from lambdaworks_kzg_tpu.ops.backend import DeviceBackend

    return EIP4844Context(
        mainnet_setup, backend=DeviceBackend(mainnet_setup)
    )


@pytest.fixture(
    scope="session",
    params=["host", pytest.param("device", marks=pytest.mark.slow)],
)
def mainnet_ctx(request, host_ctx):
    """Both math tiers: the consensus vectors gate the production device
    kernels AND the Python-int oracle (README's 'either tier' contract)."""
    if request.param == "host":
        return host_ctx
    return request.getfixturevalue("device_ctx")
