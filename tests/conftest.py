"""Test env: CPU backend with 8 virtual devices for mesh/sharding tests.

Must run before any jax import (pytest loads conftest first).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The harness pre-imports jax with JAX_PLATFORMS=axon (TPU); override late.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the fast subset is compile-bound on a
# 1-core host (~8 min cold), and XLA's persistent cache works on CPU once
# the size/time floors are lowered. Warm runs skip every unchanged
# compile. Opt out with LUNARIS_TEST_NO_CACHE=1 (e.g. to measure cold).
if not os.environ.get("LUNARIS_TEST_NO_CACHE"):
    try:
        _cache = os.path.expanduser("~/.cache/lunaris_test_jax_cache")
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

import pytest  # noqa: E402

from lunaris_orion_tpu.config import TeacherConfig, VAEConfig  # noqa: E402


@pytest.fixture(scope="session")
def tiny_vae_cfg():
    return VAEConfig(latent_dim=16, image_size=32, base_channels=16)


@pytest.fixture(scope="session")
def tiny_teacher_cfg():
    return TeacherConfig(
        num_experts=2, feature_dim=16, extractor_dim=16, extractor_stem=8,
        branch_dim=8, expert_layers=2, intermediate_dim=16, embedding_dim=8,
        num_heads=4, rel_pos_size=4, image_size=32)


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
