"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4 "multi-node testing"). Must run
before the first `import jax` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# neutralize any TPU plugin auto-registration (axon sitecustomize)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_TESTS = "/root/reference/tests"


def reference_vectors_available() -> bool:
    return os.path.isdir(REFERENCE_TESTS)


@pytest.fixture(scope="session")
def mainnet_setup():
    from lambdaworks_kzg_tpu.models import srs

    return srs.load_mainnet_setup()


@pytest.fixture(scope="session")
def mainnet_ctx(mainnet_setup):
    from lambdaworks_kzg_tpu.models.eip4844 import EIP4844Context
    from lambdaworks_kzg_tpu.models.kzg import HostBackend

    return EIP4844Context(mainnet_setup, backend=HostBackend(mainnet_setup))
