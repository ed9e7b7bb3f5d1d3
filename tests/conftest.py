"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware
(SURVEY.md section 4: the reference could never test its distributed path;
we can).

Note: in the axon environment a sitecustomize hook registers the TPU backend
and sets ``jax_platforms='axon,cpu'`` via jax.config, which overrides the
JAX_PLATFORMS env var — so CPU must be forced through jax.config here, before
any backend is initialized."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu"
