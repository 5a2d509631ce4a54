"""TPU check of the early-exit nonseq backward scan: parity + timing.

Protocol matches BASELINE.md round-4 rows: 16M rays, deterministic
lens + mirror fold, bounce budget as labeled, value_and_grad with the
value consumed, single-shot minus the measured dispatch floor.

Usage: python _tpu_nonseq_bwd.py [parity,timing]  (default both)
"""
import sys, time, statistics
import numpy as np
import jax
import jax.numpy as jnp

from raytracetorch_tpu import (Scene, SingletLens, SphericalMirror,
                               SensorElement, CollimatedDisk)

SECTIONS = set((sys.argv[1] if len(sys.argv) > 1 else 'parity,timing')
               .split(','))
key = jax.random.PRNGKey(0)


def make_scene(grid, n_bounces=6):
    sc = Scene([
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
                    c1_grad=True, c2_grad=True, name='lens'),
        SphericalMirror(c1=-0.02, d=12.0, translation=[0, 0, 40.0],
                        c1_grad=True, name='mirror'),
        SensorElement(radius=10.0, translation=[0, 0, 1.0], name='sensor'),
    ], n_bounces=n_bounces)
    if grid:
        sc.grid_shape = (256, 256)
        sc.grid_half_extent = 8.0
    return sc


def floor_ms(x):
    f = jax.jit(lambda r: r.intensity[0] + 1.0)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); float(f(x)); ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts)


def shot_ms(fn, *a, reps=3):
    out = fn(*a)  # compile
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.tree_util.tree_map(
            lambda l: None, jax.block_until_ready(fn(*a)))
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts)


if 'parity' in SECTIONS:
    # ---- parity at 256k rays: fused grads vs XLA grads ----
    sc = make_scene(grid=True)
    p = sc.init_params()
    W = jax.random.normal(jax.random.fold_in(key, 7), (1, 256, 256),
                          jnp.float32)
    rays_s = CollimatedDisk.make(radius=jnp.float32(3.0),
                                 translation=[0, 0, -10.0]).sample(key,
                                                                   262144)

    def loss(p, rays, fused):
        sim = sc.simulate_fused if fused else sc.simulate
        _, sens, _ = sim(p, rays, key)
        return (jnp.sum(sens.grid * W) * 1e-3 + sens.spot_rms(0)[0]
                + 0.1 * sens.total_weight(0)[0] * 1e-6)

    t0 = time.perf_counter()
    v_f, g_f = jax.value_and_grad(lambda q: loss(q, rays_s, True))(p)
    v_f = float(v_f)
    g_f = jax.tree_util.tree_map(np.asarray, g_f)
    print(f'fused grad cold compile+run: {time.perf_counter()-t0:.1f}s')
    v_x, g_x = jax.value_and_grad(lambda q: loss(q, rays_s, False))(p)
    print('value rel diff:', abs(v_f - float(v_x)) / abs(float(v_x)))
    for el in ('lens', 'mirror'):
        for k in g_f[el]:
            a, b = np.asarray(g_f[el][k]), np.asarray(g_x[el][k])
            rel = np.max(np.abs(a - b) / (np.abs(b) + 1e-12))
            sc_ = max(np.max(np.abs(a)), np.max(np.abs(b)), 1e-30)
            d = np.max(np.abs(a - b)) / sc_
            print(f'  grad {el}.{k}: rel {rel:.2e}  scaled-abs {d:.2e} '
                  f'(|g| max {sc_:.2e})')

if 'timing' in SECTIONS:
    # ---- timing at 16M ----
    # (grid, budget): the 24-bounce rows measure the early-exit win —
    # the scene settles well inside the budget, so the reverse loop
    # should skip the settled tail.
    for grid, budget in ((False, 6), (True, 6), (False, 24), (True, 24)):
        scT = make_scene(grid, n_bounces=budget)
        pT = scT.init_params()
        raysT = CollimatedDisk.make(radius=jnp.float32(3.0),
                                    translation=[0, 0, -10.0]).sample(
                                        key, 1 << 24)
        raysT = jax.block_until_ready(raysT)
        fl = floor_ms(raysT)
        WT = (jax.random.normal(jax.random.fold_in(key, 7),
                                (1, 256, 256), jnp.float32)
              if grid else None)

        @jax.jit
        def fwd(q, r):
            _, sens, _ = scT.simulate_fused(q, r, key)
            return sens.spot_rms(0)[0]

        @jax.jit
        def vg(q, r):
            def L(qq):
                _, sens, _ = scT.simulate_fused(qq, r, key)
                out = (sens.spot_rms(0)[0]
                       + 0.1 * sens.total_weight(0)[0] * 1e-6)
                if grid:
                    out = out + jnp.sum(sens.grid * WT) * 1e-3
                return out
            v, g = jax.value_and_grad(L)(q)
            return v, g

        f_ms = shot_ms(fwd, pT, raysT) - fl
        g_ms = shot_ms(vg, pT, raysT) - fl
        label = f'{budget}-budget ' + ('256^2 grid' if grid else 'no grid')
        print(f'16M nonseq {label}: fwd {f_ms:.1f} ms, '
              f'value+grad {g_ms:.1f} ms, bwd/fwd {(g_ms - f_ms)/f_ms + 1:.1f}x '
              f'(floor {fl:.1f})')
