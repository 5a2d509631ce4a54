"""Headless visualization utilities: spot diagrams, irradiance maps, ray
path plots, element profiles, rendered views.

These are the headless equivalents of the reference GUI's analysis panels
(spot diagram + RMS/centroid metrics, gui/workbench.py:559-656; ray-path
overlay, gui/viewport.py:233-296; XZ/YZ profile plots) — pure matplotlib,
no event loop, save-to-file or return the figure.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    return plt


def spot_diagram(hits, weights, ray_ids=None, path=None, title='Spot diagram'):
    """Scatter of sensor-plane hits colored per bundle, annotated with the
    intensity-weighted centroid and RMS radius.

    ``hits [N, 3]`` surface-local hit points, ``weights [N]`` (0 = no hit).
    Use a trace with ``record_hits=True`` and slice the sensor surface row.
    """
    plt = _plt()
    hits = np.asarray(hits)
    w = np.asarray(weights)
    keep = w > 0
    x, y, w = hits[keep, 0], hits[keep, 1], w[keep]
    ids = (np.zeros(len(x), int) if ray_ids is None
           else np.asarray(ray_ids)[keep])

    fig, ax = plt.subplots(figsize=(5, 5))
    for b in np.unique(ids):
        m = ids == b
        ax.scatter(x[m], y[m], s=2, alpha=0.5, label=f'bundle {b}')
    if w.sum() > 0:
        cx, cy = np.average(x, weights=w), np.average(y, weights=w)
        rms = np.sqrt(np.average((x - cx) ** 2 + (y - cy) ** 2, weights=w))
        ax.plot([cx], [cy], 'k+', markersize=12)
        ax.set_title(f'{title}\ncentroid=({cx:.4g}, {cy:.4g})  RMS={rms:.4g}')
    ax.set_aspect('equal')
    ax.set_xlabel('x')
    ax.set_ylabel('y')
    if len(np.unique(ids)) > 1:
        ax.legend(markerscale=4)
    if path:
        fig.savefig(path, dpi=120, bbox_inches='tight')
        plt.close(fig)
        return path
    return fig


def irradiance_map(sensors, slot=0, extent=None, path=None,
                   title='Irradiance'):
    """Heat map of a sensor's accumulated irradiance grid (core/sensor.py)."""
    plt = _plt()
    grid = np.asarray(sensors.grid[slot])
    fig, ax = plt.subplots(figsize=(5, 4))
    e = extent or 1.0
    im = ax.imshow(grid, origin='lower', extent=[-e, e, -e, e], cmap='inferno')
    fig.colorbar(im, ax=ax, label='intensity')
    ax.set_title(title)
    ax.set_xlabel('x')
    ax.set_ylabel('y')
    if path:
        fig.savefig(path, dpi=120, bbox_inches='tight')
        plt.close(fig)
        return path
    return fig


def path_plot(paths, axis='y', max_rays=100, path=None, title='Ray paths'):
    """Side-view polylines of recorded ray paths (``aux['paths']`` from a
    trace with ``record_paths=True``; the Paths-proxy equivalent,
    rays/ray.py:100).  ``axis`` picks the transverse coordinate."""
    plt = _plt()
    p = np.asarray(paths)                      # [S, N, 3]
    n = p.shape[1]
    stride = max(1, n // max_rays)
    idx = 1 if axis == 'y' else 0
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(p[:, ::stride, 2], p[:, ::stride, idx], lw=0.5, alpha=0.6,
            color='tab:blue')
    ax.set_xlabel('z')
    ax.set_ylabel(axis)
    ax.set_title(title)
    if path:
        fig.savefig(path, dpi=120, bbox_inches='tight')
        plt.close(fig)
        return path
    return fig


def profile_plot(renderer, params, element_index, axes=('x', 'y'), path=None):
    """Cross-section polylines of an element's surfaces (the GUI XZ/YZ
    profile panels; reference Renderer.scan_profile, render/camera.py:320)."""
    plt = _plt()
    fig, axs = plt.subplots(1, len(axes), figsize=(5 * len(axes), 4))
    axs = np.atleast_1d(axs)
    for ax_plot, axis in zip(axs, axes):
        coords, z, valid = renderer.scan_profile(params, element_index,
                                                 axis=axis)
        coords, z, valid = map(np.asarray, (coords, z, valid))
        for s in range(z.shape[1]):
            m = valid[:, s]
            if m.any():
                ax_plot.plot(z[m, s], coords[m], '.', markersize=2)
        ax_plot.set_xlabel('z')
        ax_plot.set_ylabel(axis)
        ax_plot.set_title(f'{axis.upper()}Z profile')
    if path:
        fig.savefig(path, dpi=120, bbox_inches='tight')
        plt.close(fig)
        return path
    return fig


def save_render(image, path):
    """Save a [H, W, 3] render_3d image to PNG."""
    plt = _plt()
    plt.imsave(path, np.clip(np.asarray(image), 0.0, 1.0))
    return path
