"""A small optical-glass catalog: d-line index + Abbe number.

Convenience for the Cauchy/Abbe dispersion model (see core/static_dispatch
::dispersive_iors): ``SingletLens(..., **glass('N-BK7'))`` fills
``ior_glass`` and ``abbe_vd``.  Values are the standard Schott/Ohara
catalog numbers.
"""

CATALOG = {
    # name: (n_d, v_d)
    'N-BK7': (1.5168, 64.17),
    'N-K5': (1.5224, 59.48),
    'N-SK16': (1.6204, 60.32),
    'N-SSK5': (1.6584, 50.88),
    'N-BAF10': (1.6700, 47.11),
    'N-LAK22': (1.6516, 55.89),
    'N-F2': (1.6200, 36.43),
    'F2': (1.6200, 36.37),
    'SF2': (1.6476, 33.85),
    'SF5': (1.6727, 32.25),
    'SF10': (1.7283, 28.53),
    'SF11': (1.7847, 25.68),
    'N-SF6': (1.8052, 25.36),
    'FUSED-SILICA': (1.4585, 67.82),
    'CAF2': (1.4338, 95.31),
}


def glass(name):
    """-> {'ior_glass': n_d, 'abbe_vd': v_d} kwargs for lens constructors."""
    nd, vd = CATALOG[name.upper()]
    return {'ior_glass': nd, 'abbe_vd': vd}


def glass_pair(crown, flint):
    """-> kwargs for DoubletLens: crown as glass1, flint as glass2."""
    n1, v1 = CATALOG[crown.upper()]
    n2, v2 = CATALOG[flint.upper()]
    return {'ior_glass1': n1, 'abbe_vd1': v1,
            'ior_glass2': n2, 'abbe_vd2': v2}
