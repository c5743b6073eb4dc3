"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes; keep this at import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# this image's sitecustomize force-registers the axon TPU backend regardless
# of JAX_PLATFORMS in the environment; the config update below wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: >60 s on the single-core CPU CI; `pytest -m 'not slow'` is "
        "the quick gate (see CLAUDE.md)",
    )
