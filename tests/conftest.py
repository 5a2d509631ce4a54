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

import json  # noqa: E402
import pathlib  # noqa: E402

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Test tiers (round-3 VERDICT weak #4): the full suite is ~40 min on one
# CPU, so iteration gates on the SMOKE tier:
#
#     pytest -m "not slow"        # ~2-3 min, 250+ tests
#     pytest                      # full suite
#
# Tiering is DATA-DRIVEN: tests/durations.json maps nodeids to their
# last measured full-run call time; anything above SLOW_SECS is
# auto-marked slow.  Tests absent from the file (new ones) stay in the
# smoke tier until re-measured.  Regenerate after adding heavy tests:
#     pytest -q --durations=0 | grep 's call' > /tmp/dur.txt  (+ rebuild)
# ---------------------------------------------------------------------------

SLOW_SECS = 2.0
_DUR = json.loads(
    (pathlib.Path(__file__).parent / 'durations.json').read_text())


def pytest_configure(config):
    config.addinivalue_line(
        'markers', 'slow: full-tier test (measured call time > '
        f'{SLOW_SECS}s); deselect with -m "not slow" for the smoke tier')


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace('tests/', '', 1)
        if _DUR.get(nodeid, 0.0) > SLOW_SECS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
