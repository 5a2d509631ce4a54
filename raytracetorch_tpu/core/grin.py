"""Gradient-index (GRIN) media: fixed-step ray integration through an
inhomogeneous rod.

Beyond the reference (whose media are all homogeneous — every
reference physics functor bends rays at surfaces only, phys/std.py):
a ``GrinRod`` element (elements/grin.py) carries a squared-index
profile

    n^2(x, y, z) = c0 + c2 r^2 + c4 r^4 + cz z,     r^2 = x^2 + y^2

in its entry-plane surface frame (z in [0, L]).  The classic SELFOC /
radial-GRIN profile n(r) = n0 sqrt(1 - A r^2) is c0 = n0^2,
c2 = -n0^2 A.

TPU-native formulation: instead of arc-length ODEs with a dynamic
stop-at-exit-plane search (a data-dependent while loop), the ray
equation is parametrized BY z — the optical momentum p = n * dr/ds
satisfies

    dx/dz = px / pz          dpx/dz = (1/pz) * d(n^2)/dx / 2
    dy/dz = py / pz          dpy/dz = (1/pz) * d(n^2)/dy / 2
    dOPL/dz = n^2 / pz       pz = sqrt(n^2 - px^2 - py^2)

(|p| = n is a first integral, so pz never needs its own equation), and
a FIXED-count RK4 ``lax.scan`` integrates exactly from the entry plane
to the exit plane — static shapes, no host control flow, fully
differentiable through every step (profile coefficients, thickness and
pose all receive gradients).

Entry/exit refraction at the flat faces is tangential-momentum
conservation: px, py pass through unchanged and pz is re-solved from
the local |p| = n constraint — Snell's law with zero trig.

Rays are KILLED (intensity 0) if they leave the rod radius (barrel
absorption), turn around (pz^2 <= 0 — a ray trapped past its turning
point would need the dynamic-s parametrization), or TIR at the exit
face.  For the parabolic profile the meridional/skew solution is
exactly sinusoidal with pz conserved, giving closed-form regression
anchors (tests/test_grin.py).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..geom import vec3 as v3
from .intersect import intersect


def _half_grad_n2(c2, c4, x, y):
    """(1/2) * d(n^2)/d(x, y) for the radial polynomial profile."""
    r2 = x * x + y * y
    g = c2 + 2.0 * c4 * r2
    return g * x, g * y


def _n2_at(c0, c2, c4, cz, x, y, z):
    r2 = x * x + y * y
    return c0 + (c2 + c4 * r2) * r2 + cz * z


def _derivs(c0, c2, c4, cz, x, y, px, py, z):
    """RHS of the z-parametrized ray ODE + the OPL rate.  Returns the
    five rates and an ``ok`` mask (pz^2 > 0 — not at a turning point).
    Double-where guarded so dead lanes never produce NaN gradients."""
    n2 = _n2_at(c0, c2, c4, cz, x, y, z)
    pz2 = n2 - px * px - py * py
    ok = pz2 > 1e-10
    inv_pz = 1.0 / jnp.sqrt(jnp.where(ok, pz2, 1.0))
    inv_pz = jnp.where(ok, inv_pz, 0.0)
    gx, gy = _half_grad_n2(c2, c4, x, y)
    return (px * inv_pz, py * inv_pz, gx * inv_pz, gy * inv_pz,
            n2 * inv_pz, ok)


def _p_dir(c0, c2, c4, cz, x, y, px, py, z):
    """Unit ray direction from the transverse momentum state at height z
    (pz re-solved from |p| = n; clamped for frozen/dead lanes)."""
    n2 = _n2_at(c0, c2, c4, cz, x, y, z)
    pz = jnp.sqrt(jnp.maximum(n2 - px * px - py * py, 1e-12))
    inv_n = 1.0 / jnp.sqrt(jnp.maximum(n2, 1e-12))
    return px * inv_n, py * inv_n, pz * inv_n


def integrate_grin(c0, c2, c4, cz, L, r2_max, x, y, px, py, n_steps,
                   er=None, ei=None, unroll=False):
    """RK4 over z in [0, L] in ``n_steps`` fixed steps (lax.scan).

    All profile coefficients and ``L`` may be traced scalars;
    ``n_steps`` is static.  State lanes that die (leave the radius or
    hit a turning point) freeze in place with ``alive`` False.

    With ``er``/``ei`` (component tuples of the complex E-field in the
    ROD frame, transverse to the entry direction), the field is
    parallel-transported along the bending ray: each step applies the
    minimal rotation taking the step's entry direction to its exit
    direction (geom/vec3.py::rotate_between — 'Rytov rotation'; exact
    for the planar meridional paths, the per-step geometric limit for
    skew/helical ones).  Norm and transversality are preserved by
    construction.

    Returns (x, y, px, py, opl, alive[, er, ei]).
    """
    h = L / n_steps
    opl0 = jnp.zeros_like(x)
    # the alive mask rides the carry as an exact {0.0, 1.0} float, not a
    # bool: Mosaic cannot legalize vector<i1> scf.for carries (the fused
    # kernels run this scan in-kernel); float products of exact 0/1
    # masks have the identical truth table
    alive0 = jnp.where((x * x + y * y) <= r2_max, 1.0, 0.0)
    track_e = er is not None

    def step(carry, i):
        if track_e:
            x, y, px, py, opl, alive, er, ei = carry
        else:
            x, y, px, py, opl, alive = carry
        z = i * h

        k1 = _derivs(c0, c2, c4, cz, x, y, px, py, z)
        k2 = _derivs(c0, c2, c4, cz,
                     x + 0.5 * h * k1[0], y + 0.5 * h * k1[1],
                     px + 0.5 * h * k1[2], py + 0.5 * h * k1[3],
                     z + 0.5 * h)
        k3 = _derivs(c0, c2, c4, cz,
                     x + 0.5 * h * k2[0], y + 0.5 * h * k2[1],
                     px + 0.5 * h * k2[2], py + 0.5 * h * k2[3],
                     z + 0.5 * h)
        k4 = _derivs(c0, c2, c4, cz,
                     x + h * k3[0], y + h * k3[1],
                     px + h * k3[2], py + h * k3[3],
                     z + h)

        def rk(i_):
            return (h / 6.0) * (k1[i_] + 2.0 * k2[i_] + 2.0 * k3[i_]
                                + k4[i_])

        xn, yn = x + rk(0), y + rk(1)
        pxn, pyn = px + rk(2), py + rk(3)
        opln = opl + rk(4)
        ok = k1[5] & k2[5] & k3[5] & k4[5]
        inside = (xn * xn + yn * yn) <= r2_max
        live_f = alive * jnp.where(ok & inside, 1.0, 0.0)
        live = live_f > 0.0
        # dead lanes freeze (state stays finite, grads stay clean)
        xn = jnp.where(live, xn, x)
        yn = jnp.where(live, yn, y)
        pxn = jnp.where(live, pxn, px)
        pyn = jnp.where(live, pyn, py)
        opln = jnp.where(live, opln, opl)
        if track_e:
            a = _p_dir(c0, c2, c4, cz, x, y, px, py, z)
            b = _p_dir(c0, c2, c4, cz, xn, yn, pxn, pyn, z + h)
            ern = v3.rotate_between(a, b, er)
            ein = v3.rotate_between(a, b, ei)
            er = v3.where(live, ern, er)
            ei = v3.where(live, ein, ei)
            return (xn, yn, pxn, pyn, opln, live_f, er, ei), None
        return (xn, yn, pxn, pyn, opln, live_f), None

    init = (x, y, px, py, opl0, alive0)
    if track_e:
        init = init + (er, ei)

    # step index rides the carry as an exact int32 counter instead of a
    # scanned arange: bitwise-identical z values (i * h either way), and
    # the scan body then has no 1-D xs slice — the form Mosaic lowers
    # when this runs inside the fused Pallas kernels
    def step_ctr(carry, _):
        i = carry[0]
        inner, _ = step(carry[1:], i.astype(x.dtype))
        return (i + 1,) + tuple(inner), None

    # ``unroll=True`` emits the n_steps bodies as straight-line code —
    # required INSIDE the fused Pallas kernels (Mosaic cannot lower the
    # rolled scan primitive, and the fused backward kernels jax.vjp the
    # body at kernel-trace time); the XLA drivers keep the rolled scan
    # (compile time, native reverse-mode).  Bitwise identical either way.
    if unroll:
        carry = (jnp.int32(0),) + tuple(init)
        for _ in range(n_steps):
            carry, _ = step_ctr(carry, None)
    else:
        carry, _ = lax.scan(step_ctr, (jnp.int32(0),) + tuple(init), None,
                            length=n_steps)
    out = list(carry[1:])
    out[5] = out[5] > 0.0              # back to the callers' bool mask
    return tuple(out)


def grin_interaction(row, meta, dir_c, hit_s, Er=None, Ei=None,
                     unroll=False):
    """Pure per-row GRIN-rod interaction: entry-couple (tangential p
    conserved), RK4 through the profile, exit-couple, land at the exit
    face in world coordinates.  Shared by the sequential driver
    (:func:`grin_surface_step`) and the non-sequential winner merge
    (core/trace.py::bounce_step) — the rod traversal is LOCAL, so when
    the entry face wins a bounce the whole entry->RK4->exit step is that
    bounce's interaction.

    With ``Er``/``Ei`` (world-frame E-field component tuples,
    ``track_field``), the polarization is parallel-transported: minimal
    rotation across the entry coupling, per-RK4-step Rytov rotation
    along the curved ray (integrate_grin), minimal rotation across the
    exit coupling — all power-preserving (the rod is lossless; dead
    rays lose their power through imod = 0 in the intensity, exactly
    like the geometric trace).  Returns ``(..., Er', Ei')`` appended.

    Returns ``(new_pos, new_dir, alive, fwd, seg_opl)`` — ``fwd`` is the
    forward-coupling mask (a backward ray, -z in the entry-plane frame,
    never couples in: the rod is one-directional and such a hit is a
    MISS); ``alive`` flags rays that traverse to the exit face (barrel
    exits / turning points / exit-face TIR die with a finite frozen
    state); ``seg_opl`` is the in-medium optical path (zero for dead
    rays)."""
    n_amb = row.ph[..., 0]
    c0, c2 = row.ph[..., 1], row.ph[..., 2]
    c4, cz = row.ph[..., 3], row.ph[..., 4]
    L = row.ph[..., 5]
    r2_max = row.sb[..., 0]          # DISK bound = radius^2
    track_e = Er is not None

    d_s = v3.rot(dir_c, row.Rw)
    fwd = d_s[2] > 1e-6
    x0, y0 = hit_s[0], hit_s[1]
    px, py = n_amb * d_s[0], n_amb * d_s[1]

    # entry face: pz from |p| = n(r, z=0); evanescent -> dead
    n2_in = _n2_at(c0, c2, c4, cz, x0, y0, jnp.zeros_like(x0))
    alive = (n2_in - px * px - py * py) > 1e-10

    er = ei = None
    if track_e:
        # into the rod frame; transport across the entry coupling
        er, ei = v3.rot(Er, row.Rw), v3.rot(Ei, row.Rw)
        d0 = _p_dir(c0, c2, c4, cz, x0, y0, px, py, jnp.zeros_like(x0))
        er = v3.rotate_between(d_s, d0, er)
        ei = v3.rotate_between(d_s, d0, ei)

    out = integrate_grin(c0, c2, c4, cz, L, r2_max, x0, y0, px, py,
                         meta.grin_steps, er=er, ei=ei, unroll=unroll)
    x1, y1, px1, py1, seg_opl, live = out[:6]
    alive = alive & live

    # exit face: tangential p conserved, pz back in the ambient medium
    pz2_out = n_amb * n_amb - px1 * px1 - py1 * py1
    ok_out = pz2_out > 1e-10
    alive = alive & ok_out
    pz_out = jnp.sqrt(jnp.where(ok_out, pz2_out, 1.0))
    inv_n = 1.0 / n_amb
    d_out = (px1 * inv_n, py1 * inv_n, pz_out * inv_n)

    exit_local = (x1, y1, jnp.broadcast_to(jnp.asarray(L, x1.dtype),
                                           x1.shape))
    new_pos = v3.add(v3.rot_t(exit_local, row.Rw), v3.from_array(row.tw))
    new_dir = v3.rot_t(d_out, row.Rw)
    base = (new_pos, new_dir, alive, fwd, jnp.where(alive, seg_opl, 0.0))
    if track_e:
        er, ei = out[6], out[7]
        Lz = jnp.broadcast_to(jnp.asarray(L, x1.dtype), x1.shape)
        d1 = _p_dir(c0, c2, c4, cz, x1, y1, px1, py1, Lz)
        er = v3.rotate_between(d1, d_out, er)
        ei = v3.rotate_between(d1, d_out, ei)
        return base + (v3.rot_t(er, row.Rw), v3.rot_t(ei, row.Rw))
    return base


def grin_surface_step(row, meta, rays, field=None):
    """One GRIN-rod interaction for the sequential driver: intersect the
    entry plane, run :func:`grin_interaction`, and apply the masked ray
    update (and the masked field update when ``field`` is a FieldState).

    Returns ``(rays, active, t_entry, seg_opl, field)`` — ``seg_opl`` is
    the in-medium optical path (for track_opl accumulation; the caller
    adds the free-flight n*t to the entry plane).
    """
    res = intersect(row, rays.pos_c, rays.dir_c, static_meta=meta)
    out = grin_interaction(
        row, meta, rays.dir_c, res['hit_s'],
        Er=field.r_c if field is not None else None,
        Ei=field.i_c if field is not None else None)
    new_pos, new_dir, alive, fwd, seg_opl = out[:5]
    active = res['valid'] & (rays.intensity > 0) & fwd
    imod = jnp.where(active & alive, 1.0, 0.0)
    rays = rays.masked_update(active, new_pos, new_dir, imod)
    if field is not None:
        field = field.masked(active, out[5], out[6])
    return rays, active, res['t'], jnp.where(active, seg_opl, 0.0), field
