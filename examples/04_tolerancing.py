"""Monte-Carlo tolerancing: spot-size yield under lens decenter/tilt."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, SensorElement,
                               SequentialScene, SingletLens)
from raytracetorch_tpu.utils.tolerancing import monte_carlo_tolerance

OUT = os.path.join(os.path.dirname(__file__), 'output')


def main():
    key = jax.random.PRNGKey(0)
    scene = SequentialScene([
        SingletLens(c1=0.016667, c2=-0.00283, d=25.4, t=4.0,
                    ior_glass=1.5168, name='lens'),
        SensorElement(radius=20.0, translation=[0, 0, 100.0], name='sensor'),
    ])
    p = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(5.0),
                               translation=[0, 0, -10.0]).sample(key, 20000)
    noise = {'lens': ((0.05, 0.05, 0.1), (0.002, 0.002, 0.0))}
    states = monte_carlo_tolerance(scene, p, rays, key, noise, n_trials=256)
    m = np.asarray(states.moments)[:, 0, 0]
    w = np.maximum(m[:, 0], 1e-9)
    rms = np.sqrt(np.maximum((m[:, 3] + m[:, 4]) / w
                             - (m[:, 1] / w) ** 2 - (m[:, 2] / w) ** 2, 0))

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.hist(rms, bins=32)
    ax.set_xlabel('RMS spot radius')
    ax.set_ylabel('builds')
    ax.set_title('256-build Monte-Carlo tolerance analysis\n'
                 '(50 um decenter, 2 mrad tilt, 100 um despace)')
    fig.savefig(os.path.join(OUT, 'tolerance_hist.png'), dpi=120,
                bbox_inches='tight')
    print(f"nominal-ish median RMS {np.median(rms):.4f}, "
          f"95th pct {np.percentile(rms, 95):.4f}")


if __name__ == '__main__':
    main()
