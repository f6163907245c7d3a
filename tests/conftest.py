"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere.
"""

import os

# hard-override: the ambient environment pins JAX_PLATFORMS=axon (real TPU)
# and a sitecustomize module registers that PJRT plugin at interpreter start,
# so jax is already imported — only config.update can redirect to CPU here.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


@pytest.fixture()
def working_dir(tmp_path):
    """A fresh working directory with a default config, activated globally."""
    from syconn_tpu import global_params
    from syconn_tpu.handler.config import generate_default_conf

    wd = str(tmp_path / "wd")
    generate_default_conf(wd, scaling=(10, 10, 20))
    prev = global_params.wd
    global_params.wd = wd
    yield wd
    global_params.wd = prev
