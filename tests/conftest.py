"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the fake-backend strategy from SURVEY.md §4.4 — the same pjit programs
that run on a TPU pod slice run here on 8 host devices, letting CI assert
sharded-vs-single-device equivalence without TPU hardware.

Must set the env vars BEFORE jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# A TPU-attached environment may register its PJRT plugin from
# sitecustomize and set jax_platforms programmatically (which overrides the
# env var). Force the CPU backend explicitly so the suite never rides a
# live TPU tunnel.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs


@pytest.fixture(scope="session")
def mesh():
    from reid_gan_tpu.parallel import get_mesh

    return get_mesh()


@pytest.fixture()
def rng():
    return np.random.RandomState(0)
