"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors the multi-device test strategy called for in SURVEY.md §4 — DP/mesh
logic is exercised without TPU hardware via
--xla_force_host_platform_device_count.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

# the axon sitecustomize force-registers the TPU platform and overrides
# JAX_PLATFORMS from the environment; re-assert CPU for tests
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
