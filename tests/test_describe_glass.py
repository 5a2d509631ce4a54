"""Glass catalog + prescription report tests."""

import numpy as np

from raytracetorch_tpu import (DoubletLens, SensorElement, SequentialScene,
                               SingletLens, describe, glass, glass_pair)


def test_glass_catalog():
    g = glass('N-BK7')
    assert g == {'ior_glass': 1.5168, 'abbe_vd': 64.17}
    gp = glass_pair('N-BK7', 'SF5')
    assert gp['ior_glass2'] == 1.6727 and gp['abbe_vd2'] == 32.25


def test_describe_contains_prescription():
    scene = SequentialScene([
        SingletLens(c1=0.02, c2=-0.02, d=20.0, t=3.0, **glass('N-BK7'),
                    name='lens'),
        SensorElement(radius=10.0, translation=[0, 0, 50.0], name='img'),
    ])
    text = describe(scene)
    assert 'lens' in text and 'img' in text
    assert 'dispersive' in text and 'sensor' in text
    assert '50.000' in text      # R = 1/0.02
