"""SPMD ray sharding over a TPU device mesh.

The parallel substrate of this framework (SURVEY.md §2.12): ray batches are
data-parallel along N, parameters (dozens of scalars) are replicated, and
the only cross-device traffic is the psum of sensor moment / irradiance /
loss reductions — inserted automatically by XLA from the shardings below,
riding ICI.  There is deliberately no port of a comms library: the
reference has none (no torch.distributed anywhere), and on TPU the XLA
runtime *is* the comms backend.

Mesh convention: 2-D ('data', 'rays').  Bundles x rays both shard the ray
axis; a 1-D mesh is the n_data=1 special case.  The scene trace is pure
elementwise over N plus [B]- or [H,W]-shaped scatter-add reductions, so a
NamedSharding on the ray inputs is all XLA needs — every intermediate
shards along N and the accumulators come out replicated after psum.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..rays.ray import Rays

RAY_AXES = ('data', 'rays')


def make_mesh(n_devices=None, n_data=None):
    """A ('data', 'rays') mesh over the first n_devices.  ``n_data`` splits
    the devices between the two axes (default: most-square split with
    n_data <= n_rays)."""
    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = 1
        for cand in range(int(np.sqrt(n)), 0, -1):
            if n % cand == 0:
                n_data = cand
                break
    grid = np.asarray(devices).reshape(n_data, n // n_data)
    return Mesh(grid, RAY_AXES)


def ray_sharding(mesh):
    """NamedSharding placing the ray axis over BOTH mesh axes (fully
    data-parallel over all devices)."""
    return NamedSharding(mesh, P(RAY_AXES))


def shard_rays(rays: Rays, mesh) -> Rays:
    """Device-put a ray batch with its N axis sharded across the mesh.
    N must divide by the device count.  (All Rays leaves are [N] component
    arrays — see rays/ray.py.)"""
    s1 = NamedSharding(mesh, P(RAY_AXES))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s1), rays)


def replicated(mesh):
    return NamedSharding(mesh, P())


def mesh_ray_axes(mesh):
    """The mesh axes the ray batch shards over (subset of RAY_AXES
    present in the mesh)."""
    return tuple(a for a in RAY_AXES if a in mesh.axis_names)


def shard_index(mesh, axes):
    """Linear shard index over the given mesh axes (inside shard_map) —
    used to fold per-shard PRNG keys."""
    import jax
    idx = jax.lax.axis_index(axes[0])
    for a in axes[1:]:
        idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
    return idx


def shard_map_trace(local, mesh, n_extra=0, aux=False):
    """shard_map wiring shared by the fused-kernel sharded drivers
    (scene.simulate_fused_sharded): ``local(table, rays_shard, key,
    *extra)`` runs per shard; the table, key and any ``n_extra`` trailing
    args (e.g. a launch-polarization vector) replicate, rays shard over
    the ray axes, and outputs are (sharded rays, replicated sensors[,
    sharded per-ray aux dict when ``aux``]).  Returns
    ``(wrapped_fn, axes)``."""
    from jax.sharding import PartitionSpec as P
    axes = mesh_ray_axes(mesh)
    kw = dict(mesh=mesh,
              in_specs=(P(), P(axes), P()) + (P(),) * n_extra,
              out_specs=(P(axes), P()) + ((P(axes),) if aux else ()))
    # jax.shard_map is the stable home since 0.6 (this package pins
    # jax >= 0.6; the pre-0.6 jax.experimental.shard_map fallback was
    # removed once no supported runtime needed it).  check_vma=False is
    # REQUIRED, not a shim: the body calls pl.pallas_call, whose
    # jax.ShapeDtypeStruct out_shapes carry no varying-manual-axes
    # annotation, and the checker hard-errors on vma=None (probed on
    # jax 0.9.0 — re-enable once pallas out_shapes accept vma).  The
    # replication property the checker would enforce is asserted
    # behaviorally by the shard-count invariance suite
    # (tests/test_sharding.py).
    fn = jax.shard_map(local, check_vma=False, **kw)
    return fn, axes


def init_multihost(coordinator_address=None, num_processes=None,
                   process_id=None):
    """Initialize multi-host JAX (DCN across slices/hosts).

    The same trace programs scale across hosts unchanged: rays shard over
    the global ('data', 'rays') mesh, parameters replicate, and XLA routes
    the sensor/loss psums over ICI within a slice and DCN across slices.
    On Cloud TPU pods the arguments are auto-detected from the environment;
    pass them explicitly elsewhere.  (Single-host sessions never need this.)

    Verified by a 2-process CPU simulation (Gloo collectives standing in
    for DCN): tests/test_multihost.py shards one trace over a 2-host x
    2-device global mesh and reproduces single-process sensor moments.
    """
    import jax
    kw = {}
    if coordinator_address is not None:
        kw.update(coordinator_address=coordinator_address,
                  num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kw)
    return make_mesh()
