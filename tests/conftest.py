"""Test harness: run everything on a virtual multi-device CPU platform.

The container's axon sitecustomize force-registers the TPU backend and
overrides JAX_PLATFORMS, so the env-var route does not stick; the config
update below does.  Sharding tests rely on the 8 virtual host devices; CPU
keeps compiles fast and float32 matmuls exact.  The real-TPU path is
exercised by bench.py / __graft_entry__.py instead.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# Persistent compile cache: the suite is dominated by jit compiles
jax.config.update('jax_compilation_cache_dir', '/tmp/rtt_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
