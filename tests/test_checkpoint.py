"""Orbax checkpoint/resume: an interrupted adam design run resumed from
a checkpoint follows the EXACT trajectory of the uninterrupted run
(params + optimizer moments + step all restored).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from raytracetorch_tpu import (CollimatedDisk, SensorElement,
                               SequentialScene, SingletLens)
from raytracetorch_tpu.project import load_checkpoint, save_checkpoint


def _setup(key):
    sc = SequentialScene([
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
                    c1_grad=True, c2_grad=True, name='lens'),
        SensorElement(radius=6.0, translation=[0, 0, 19.0], name='s')])
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0, 0, -10.0]).sample(key, 4000)

    def loss(p):
        _, sens, _ = sc.simulate(p, rays, key)
        return sens.spot_rms(0)[0]

    return sc, jax.jit(jax.value_and_grad(loss))


def test_checkpoint_resume_exact(key, tmp_path):
    sc, vg = _setup(key)
    opt = optax.adam(1e-3)

    def run(p, st, steps):
        hist = []
        for _ in range(steps):
            l, g = vg(p)
            up, st = opt.update(g, st, p)
            p = optax.apply_updates(p, up)
            hist.append(float(l))
        return p, st, hist

    # uninterrupted: 8 steps
    p0 = sc.init_params()
    st0 = opt.init(p0)
    p_full, st_full, h_full = run(p0, st0, 8)

    # interrupted: 4 steps, checkpoint, restore, 4 more
    p_a, st_a, h_a = run(p0, opt.init(p0), 4)
    save_checkpoint(tmp_path / 'ck', p_a, opt_state=st_a, step=4,
                    extra={'loss_hist': jnp.asarray(h_a)})
    like = {'params': p0, 'opt_state': opt.init(p0), 'step': 0,
            'extra': {'loss_hist': jnp.zeros(4)}}
    ck = load_checkpoint(tmp_path / 'ck', like=like)
    assert int(ck['step']) == 4
    np.testing.assert_allclose(np.asarray(ck['extra']['loss_hist']),
                               h_a, rtol=1e-6)
    p_b, st_b, h_b = run(ck['params'], ck['opt_state'], 4)

    # exact trajectory equality (same optimizer moments -> same steps)
    for leaf_full, leaf_res in zip(jax.tree.leaves(p_full),
                                   jax.tree.leaves(p_b)):
        np.testing.assert_allclose(np.asarray(leaf_full),
                                   np.asarray(leaf_res), atol=1e-7)
    np.testing.assert_allclose(h_full[4:], h_b, rtol=1e-5)


def test_checkpoint_params_only(key, tmp_path):
    sc, _ = _setup(key)
    p = sc.init_params()
    save_checkpoint(tmp_path / 'ck2', p)
    ck = load_checkpoint(tmp_path / 'ck2')
    np.testing.assert_allclose(
        np.asarray(ck['params']['lens']['c1']),
        np.asarray(p['lens']['c1']))
    assert int(ck['step']) == 0
