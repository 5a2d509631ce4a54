"""Profiling utility tests."""

import jax.numpy as jnp

from raytracetorch_tpu.utils.profiling import device_time_ms, trace


def test_device_time_ms_runs():
    x = jnp.ones((10000,))
    ms = device_time_ms(lambda c: c * 1.0000001 + 1e-9, x, chain=20, reps=2)
    assert ms >= 0.0


def test_trace_context(tmp_path):
    import os
    with trace(str(tmp_path / 'tr')) as logdir:
        y = jnp.sum(jnp.ones((100,)) * 2.0)
        float(y)
    assert os.path.isdir(logdir)
