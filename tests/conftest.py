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

# Persistent compilation cache: the fast tier's cost is dominated by
# recompiling the same small jits every run (VERDICT r2 weak #4).  Cache
# survives across pytest invocations; first run pays compile, reruns don't.
_cache_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax-pytest")
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: compile-heavy test (full-model CPU jit, minutes)"
    )


def pytest_collection_modifyitems(config, items):
    """Auto-tier: modules that jit entire models on CPU are 'slow'; everything
    else is fast.  `pytest -m 'not slow'` finishes in ~2 min and is the
    default gate; the full suite is for pre-milestone verification."""
    import pytest as _pytest

    slow_modules = {
        "test_maskformer", "test_maskfiner", "test_mrml", "test_oracle",
        "test_updown", "test_train_step", "test_aff", "test_msdetrpc_pallas",
        "test_convert_checkpoint", "test_reference_parity", "test_pallas",
        "test_baseline_backbones", "test_demo_async", "test_syncbn",
    }
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in slow_modules:
            item.add_marker(_pytest.mark.slow)
