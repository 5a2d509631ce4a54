"""Beam footprints: where the bundle lands on every surface.

The standard clearance/vignetting diagnostic (no reference
counterpart — its sensors record hits, elements/sensor.py:22-39, but
nothing reports intermediate surfaces): one sequential trace with
``record_hits=True`` yields each surface's SURFACE-LOCAL hit cloud;
:func:`footprints` packages them with per-surface extent statistics,
and :func:`footprint_report` prints the clearance table (max hit
radius vs the surface's own semi-diameter where one is known).
"""

from __future__ import annotations

import numpy as np


def _row_labels(scene):
    labels = []
    for el in scene.elements:
        for i in range(el.n_surfaces):
            labels.append(f'{el.name}[{i}]')
    return labels


def _row_semidias(scene, params):
    """Best-effort clear semi-diameter per surface row (None where the
    element type carries no obvious aperture parameter)."""
    out = []
    for el in scene.elements:
        p = params[el.name]
        if 'radius' in p:
            r = float(np.asarray(p['radius']))
        elif 'd' in p:
            d = float(np.asarray(p['d']))
            r = d / 2.0 if d > 0 else None
        elif 'half_x' in p:
            r = float(np.asarray(p['half_x']))
        elif 'diameter' in p:
            dia = float(np.asarray(p['diameter']))
            r = dia / 2.0 if dia < 1e17 else None
        else:
            r = None
        out.extend([r] * el.n_surfaces)
    return out


def footprints(scene, params, rays, key):
    """-> list of per-surface dicts:

    ``label``, ``x``/``y`` (surface-local hit coords of rays that hit
    with weight), ``w`` (incoming intensity), ``r_max`` (largest hit
    radius), ``semi_dia`` (the element's clear semi-aperture or None),
    ``fill`` (r_max / semi_dia), ``n`` (hit count).

    Sequential scenes only (the per-surface record is ordered).
    """
    if not scene.sequential:
        raise ValueError('footprints needs a SequentialScene (ordered '
                         'per-surface hit record)')
    out, _, aux = scene.simulate(params, rays, key, record_hits=True)
    hits = np.asarray(aux['hits'])          # [K, N, 3] surface-local
    # hit_weights are sensor weights (0 on non-sensors) — recompute the
    # footprint mask from geometry: a ray contributes to row k if its
    # hit is finite and it was alive entering the surface.  The
    # sequential driver records hit_s for EVERY row; dead rays carry
    # stale positions, so gate on the intensity BEFORE the row —
    # reconstructed by replaying intensity cumulatively is overkill;
    # the final intensity > 0 marks rays alive through the WHOLE train,
    # the conservative footprint (exactly the rays that matter for
    # clearance).
    alive = np.asarray(out.intensity) > 0
    labels = _row_labels(scene)
    semis = _row_semidias(scene, params)
    reports = []
    for k, lab in enumerate(labels):
        x = hits[k, alive, 0]
        y = hits[k, alive, 1]
        r = np.sqrt(x * x + y * y)
        r_max = float(r.max()) if r.size else 0.0
        semi = semis[k]
        reports.append({
            'label': lab, 'x': x, 'y': y,
            'w': np.asarray(out.intensity)[alive],
            'r_max': r_max, 'semi_dia': semi,
            'fill': (r_max / semi) if semi else None,
            'n': int(alive.sum()),
        })
    return reports


def footprint_report(reports, top=None):
    """Clearance table: one line per surface, sorted as traced."""
    lines = ['surface            r_max    semi-dia   fill']
    for rp in reports[:top]:
        semi = f"{rp['semi_dia']:8.3f}" if rp['semi_dia'] else '       -'
        fill = f"{100 * rp['fill']:5.1f}%" if rp['fill'] else '     -'
        lines.append(f"{rp['label']:<16s} {rp['r_max']:8.3f} {semi}   "
                     f"{fill}")
    return '\n'.join(lines)
