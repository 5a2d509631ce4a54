"""Footprint analysis: geometric anchors (beam radius on each surface
of a simple focusing train), clearance fills, report rendering.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu import (CircularAperture, CollimatedDisk, Scene,
                               SensorElement, SequentialScene, SingletLens)
from raytracetorch_tpu.utils.footprint import footprint_report, footprints


def test_footprints_geometry(key):
    """Collimated r=3 beam through a singlet focusing at ~20: the lens
    faces see ~the full 3.0, a mid-train aperture sees the converging
    cone's radius 3 (1 - z/f), the sensor (at focus) ~0."""
    f = 20.0
    c = 1.0 / (2 * 0.5 * f)
    sc = SequentialScene([
        SingletLens(c1=c, c2=-c, d=9.0, t=1.5, ior_glass=1.5, name='lens'),
        CircularAperture(radius=4.0, translation=[0, 0, 10.0],
                         name='stop'),
        SensorElement(radius=5.0, translation=[0, 0, 20.2], name='sens')])
    rays = CollimatedDisk.make(radius=jnp.float32(3.0),
                               translation=[0, 0, -8.0]).sample(key,
                                                                20_000)
    reps = footprints(sc, sc.init_params(), rays, key)
    labels = [r['label'] for r in reps]
    assert labels[0] == 'lens[0]' and 'stop[0]' in labels
    by = {r['label']: r for r in reps}
    assert by['lens[0]']['r_max'] == pytest.approx(3.0, rel=0.02)
    # converging cone at z=10: r ~ 3 * (1 - 10/20.2-ish)
    assert by['stop[0]']['r_max'] == pytest.approx(3.0 * (1 - 10 / 20.2),
                                                   rel=0.12)
    assert by['sens[0]']['r_max'] < 0.2
    # fills: lens semi-dia 4.5 -> ~67%
    assert by['lens[0]']['fill'] == pytest.approx(3.0 / 4.5, rel=0.05)
    txt = footprint_report(reps)
    assert 'lens[0]' in txt and 'fill' in txt


def test_footprints_guards(key):
    sc = Scene([SensorElement(radius=5.0, translation=[0, 0, 10.0],
                              name='s')], n_bounces=2)
    rays = CollimatedDisk.make(radius=jnp.float32(1.0),
                               translation=[0, 0, -5.0]).sample(key, 128)
    with pytest.raises(ValueError, match='Sequential'):
        footprints(sc, sc.init_params(), rays, key)
