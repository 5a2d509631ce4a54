"""Measure the PyTorch-CPU reference baseline (BASELINE.md protocol §1).

Runs the *reference's own* geometry/physics/element code (mounted read-only
at /root/reference) on torch-CPU over the committed benchmark scene
(reference benchmarks/sim_benchmark.py:56-95) in the sequential-scene
traversal pattern (reference scene/sequential.py:12-36).

The reference package's ``Rays`` tensorclass requires the ``tensordict``
dependency, which is not in this image; its geom/phys/elements layers only
duck-type rays (``.pos/.dir/.intensity/.with_coords``), so we assemble an
import shim exposing those subpackages and drive them with a minimal Rays
stand-in that replicates ``Rays.scatter_update`` (reference rays/ray.py:29)
with plain tensors.  No reference code is copied into this repo — the shim
symlinks to the read-only mount at runtime.

Usage:  python benchmarks/reference_cpu_baseline.py [N_rays ...]
Prints one JSON line per ray count: {"n": ..., "ms": ..., "rays_per_s": ...}
"""

import json
import os
import statistics
import sys
import tempfile
import time

import torch
import torch.nn.functional as F

REFERENCE = '/root/reference'
REPEATS = int(os.environ.get('BENCH_REPEATS', 5))
WARMUP = int(os.environ.get('BENCH_WARMUP', 2))


def make_shim():
    shim = tempfile.mkdtemp(prefix='refshim_')
    pkg = os.path.join(shim, 'refpkg')
    os.mkdir(pkg)
    open(os.path.join(pkg, '__init__.py'), 'w').close()
    for sub in ('geom', 'phys', 'elements'):
        os.symlink(os.path.join(REFERENCE, sub), os.path.join(pkg, sub))
    sys.path.insert(0, shim)
    return pkg


class FakeRays:
    """Minimal stand-in for the reference Rays tensorclass (rays/ray.py:7):
    normalized dirs, differentiable-style masked scatter_update."""

    def __init__(self, pos, direction, intensity=None):
        self.pos = pos
        self.dir = F.normalize(direction, p=2, dim=1)
        n = pos.shape[0]
        self.intensity = (torch.ones(n) if intensity is None else intensity)
        self.id = torch.zeros(n, dtype=torch.int8)
        self.wavelength = torch.zeros(n)

    def with_coords(self, new_pos, new_dir):
        out = FakeRays.__new__(FakeRays)
        out.pos, out.dir = new_pos, new_dir
        out.intensity, out.id, out.wavelength = (self.intensity, self.id,
                                                 self.wavelength)
        return out

    def __getitem__(self, mask):
        out = FakeRays.__new__(FakeRays)
        out.pos, out.dir = self.pos[mask], self.dir[mask]
        out.intensity = self.intensity[mask]
        out.id, out.wavelength = self.id[mask], self.wavelength[mask]
        return out

    def scatter_update(self, mask, new_pos, new_dir, intensity_mod):
        idx = (mask,)
        self.pos = self.pos.index_put(idx, new_pos)
        self.dir = self.dir.index_put(idx, new_dir)
        self.intensity = self.intensity.index_put(
            idx, self.intensity[mask] * intensity_mod)


def build_scene():
    from refpkg.elements.lens import SingletLens
    from refpkg.elements.aperture import CircularAperture
    from refpkg.elements.sensor import Sensor
    from refpkg.geom.bounded import Disk
    from refpkg.geom.transform import RayTransform

    lens = SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0,
                       ior_glass=1.5, ior_media=1.0)
    aperture = CircularAperture(
        radius=5.0, transform=RayTransform(translation=[0.0, 0.0, 0.0]))
    sensor = Sensor(shape=Disk(
        radius=6.0, transform=RayTransform(translation=[0.0, 0.0, 19.0])))
    return [lens, aperture, sensor]


def sample_disk(n, radius=4.0, z=-10.0):
    r = torch.sqrt(torch.rand(n) * radius * radius)
    th = torch.rand(n) * (2 * torch.pi)
    pos = torch.stack([r * torch.cos(th), r * torch.sin(th),
                       torch.full((n,), z)], dim=1)
    d = torch.zeros(n, 3)
    d[:, 2] = 1.0
    return FakeRays(pos, d)


def sequential_trace(elements, rays):
    """Reference SequentialScene.simulate (scene/sequential.py:12-36)."""
    for element in elements:
        n_surf = (len(element.shape) if hasattr(element.shape, '__len__')
                  else 1)
        for i in range(n_surf):
            t = element.intersectTest(rays)[:, i]
            ray_mask = t < float('inf')
            if not torch.any(ray_mask):
                continue
            rays_valid = rays[ray_mask]
            new_pos, new_dir, intensity_mod = element(rays_valid, i)
            rays.scatter_update(ray_mask, new_pos, new_dir, intensity_mod)
    return rays


def main():
    torch.set_num_threads(os.cpu_count())
    make_shim()
    counts = [int(a) for a in sys.argv[1:]] or [4096, 16384, 64000, 128000,
                                                1_000_000]
    elements = build_scene()
    for n in counts:
        for _ in range(WARMUP):
            sequential_trace(elements, sample_disk(n))
        times = []
        for _ in range(REPEATS):
            rays = sample_disk(n)
            t0 = time.perf_counter()
            sequential_trace(elements, rays)
            times.append(time.perf_counter() - t0)
        ms = statistics.mean(times) * 1e3
        print(json.dumps({'n': n, 'ms': round(ms, 3),
                          'rays_per_s': round(n / (ms / 1e3))}), flush=True)


if __name__ == '__main__':
    main()
