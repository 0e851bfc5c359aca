"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware by forcing the
host platform to expose 8 devices (the TPU-world analogue of the reference's
in-memory fake DB backend — see SURVEY.md section 4).
"""

import os

# Must be set before jax backends initialize. The environment pins
# JAX_PLATFORMS to the TPU tunnel (the env var alone is not enough — the
# platform plugin wins), so also force the config flag.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed():
    return 1337
