"""Zemax ``.zmx`` prescription import.

Interop with the industry's dominant exchange format, so published and
vendor prescriptions load directly into a traceable, differentiable
``SequentialScene``.  No reference counterpart (the torch reference has
only its own ``.rtt`` JSON format, reference project.py:1-60) — this is
a beyond-reference capability like the glass catalog it leans on.

Supported subset (the sequential-design core of the format):

* ``MODE SEQ`` files; lens units MM/CM/IN/METER (scaled to the scene's
  lens unit = mm).
* ``STANDARD`` and ``EVENASPH`` surface types: curvature, conic,
  even-asphere terms r^4..r^10 (Zemax PARM 2..5 — a PARM 1 r^2 term has
  no exact counterpart and raises).
* Glass runs: 2 consecutive refracting faces -> ``SingletLens`` /
  ``AsphericLens``, 3 -> cemented ``DoubletLens``, 4 -> ``TripletLens``.
  Named glasses resolve through ``utils.glass`` (Sellmeier coefficients
  when cataloged, else the (nd, vd) Cauchy model from the GLAS line).
* ``STOP`` surface -> ``CircularAperture``; the image surface ->
  ``SensorElement``.
* ``COORDBRK`` surfaces: x/y decenters + intrinsic x/y/z tilts
  (degrees) with the order flag, tracked as a running rigid frame —
  perturbed/wedged prescriptions import with correct element poses
  (restore pairs compose back to identity exactly).
* Fold mirrors (``GLAS MIRROR``): flat, spherical, CONIC (CONI — a
  Cassegrain/RC hyperbolic secondary imports as ``ConicMirror``) or
  even-aspheric (EVENASPH -> ``AsphericMirror``), at any COORDBRK tilt
  incl. normal incidence.  Zemax encodes reversed propagation as
  NEGATIVE thicknesses/curvatures after an odd number of mirrors; the
  importer tracks that parity and gives each subsequent element a
  beam-aligned frame (180-degree flip) with re-signed curvatures, so a
  folded system traces identically to its unfolded equivalent.
* Mangin mirrors: the explicit three-surface double pass Zemax writes
  (glass face / MIRROR / glass face with negated return thickness)
  folds onto ``ManginMirror`` (d-line index; the pattern must be the
  simple unwedged one).
* ``ENPD`` / ``WAVM`` become the suggested entrance-pupil radius and
  wavelength list on the returned metadata.

* Curved stops (a STOP surface with CURV) import as a
  ``CircularAperture(curvature=...)`` — the opening sits on the
  spherical cap, as tooled onto a lens face.

Out of scope (raise ValueError, never import silently wrong):
diffractive surfaces, conic stops, tilted cemented interfaces,
aspheric/wedged Mangin faces, and glass runs longer than four faces.
"""

from __future__ import annotations

import io
import os
from dataclasses import dataclass, field

_UNIT_MM = {'MM': 1.0, 'CM': 10.0, 'IN': 25.4, 'METER': 1000.0, 'M': 1000.0}

_SUPPORTED_TYPES = {'STANDARD', 'EVENASPH'}


@dataclass
class ZmxSurface:
    """One SURF block, in file order (Zemax conventions, scaled to mm)."""
    index: int
    type: str = 'STANDARD'
    curv: float = 0.0           # 1/radius; + = center of curvature at +z
    disz: float = 0.0           # gap to the NEXT surface (inf for object)
    conic: float = 0.0
    parm: dict = field(default_factory=dict)   # Zemax PARM i -> value
    glass: str | None = None    # material AFTER this surface (None = air)
    nd: float | None = None     # index from the GLAS line, if given
    vd: float | None = None
    semi_diam: float = 0.0      # DIAM value (Zemax stores the semi-diam)
    is_stop: bool = False
    comment: str = ''


@dataclass
class ZmxImport:
    """Result of :func:`load_zmx`."""
    scene: object               # SequentialScene
    elements: list              # the same elements, importable order
    wavelengths_um: list        # WAVM wavelengths
    primary_wave_um: float | None
    enpd: float | None          # entrance pupil DIAMETER (mm)
    name: str = ''
    surfaces: list = field(default_factory=list)   # parsed ZmxSurface rows


def _read_text(path_or_text):
    """.zmx files ship as UTF-16 (BOM) or plain ASCII; accept raw text,
    bytes, or a path."""
    if isinstance(path_or_text, bytes):
        data = path_or_text
    elif isinstance(path_or_text, str) and '\n' not in path_or_text \
            and os.path.exists(path_or_text):
        with open(path_or_text, 'rb') as f:
            data = f.read()
    elif isinstance(path_or_text, str):
        return path_or_text
    elif isinstance(path_or_text, io.IOBase):
        data = path_or_text.read()
        if isinstance(data, str):
            return data
    else:
        raise TypeError(f'cannot read zmx from {type(path_or_text)}')
    for enc in ('utf-16', 'utf-8-sig', 'latin-1'):
        try:
            text = data.decode(enc)
        except (UnicodeDecodeError, UnicodeError):
            continue
        if 'SURF' in text or 'VERS' in text or 'MODE' in text:
            return text
    raise ValueError('not a recognizable .zmx file (no SURF/VERS/MODE '
                     'keyword under utf-16/utf-8/latin-1)')


def parse_zmx(path_or_text):
    """-> (surfaces, meta) — the raw keyword-level parse, mm-scaled.

    ``meta``: dict with 'name', 'mode', 'unit_scale', 'enpd',
    'wavelengths_um', 'primary_wave_um'.
    """
    text = _read_text(path_or_text)
    surfaces = []
    cur = None
    meta = {'name': '', 'mode': 'SEQ', 'unit_scale': 1.0, 'enpd': None,
            'wavelengths_um': [], 'primary_wave_um': None}
    waves = {}
    primary_idx = 1
    scale = 1.0
    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            continue
        parts = line.split()
        kw = parts[0].upper()
        args = parts[1:]
        if kw == 'UNIT' and args:
            scale = _UNIT_MM.get(args[0].upper())
            if scale is None:
                raise ValueError(f'unsupported lens unit {args[0]!r}')
            meta['unit_scale'] = scale
        elif kw == 'MODE' and args:
            meta['mode'] = args[0].upper()
        elif kw == 'NAME':
            meta['name'] = ' '.join(args)
        elif kw == 'ENPD' and args:
            meta['enpd'] = float(args[0])
        elif kw in ('WAVM', 'WAVL', 'WAVE') and len(args) >= 2:
            try:
                waves[int(args[0])] = float(args[1])
            except ValueError:
                pass
        elif kw == 'PWAV' and args:
            primary_idx = int(args[0])
        elif kw == 'SURF':
            cur = ZmxSurface(index=int(args[0]))
            surfaces.append(cur)
        elif cur is None:
            continue
        elif kw == 'TYPE' and args:
            cur.type = args[0].upper()
        elif kw == 'CURV' and args:
            cur.curv = float(args[0])
        elif kw == 'CONI' and args:
            cur.conic = float(args[0])
        elif kw == 'DISZ' and args:
            a = args[0].upper()
            cur.disz = float('inf') if a == 'INFINITY' else float(args[0])
        elif kw == 'PARM' and len(args) >= 2:
            cur.parm[int(args[0])] = float(args[1])
        elif kw == 'DIAM' and args:
            cur.semi_diam = float(args[0])
        elif kw == 'STOP':
            cur.is_stop = True
        elif kw == 'GLAS' and args:
            cur.glass = args[0]
            if len(args) >= 5:
                try:
                    nd, vd = float(args[3]), float(args[4])
                    if nd > 1.0:
                        cur.nd, cur.vd = nd, (vd if vd > 0 else None)
                except ValueError:
                    pass
        elif kw == 'COMM':
            cur.comment = ' '.join(args)
    # apply unit scaling (UNIT may appear before or after SURF blocks —
    # Zemax writes it in the header, but scale at the end to be safe).
    # WAVM wavelengths are ALWAYS micrometers, independent of UNIT.
    if scale != 1.0:
        for s in surfaces:
            s.curv = s.curv / scale
            if s.disz != float('inf'):
                s.disz *= scale
            s.semi_diam *= scale
            # even-asphere PARM i multiplies r^(2i): coefficient carries
            # units of length^(1-2i)
            s.parm = {i: v / scale ** (2 * i - 1) for i, v in s.parm.items()}
        if meta['enpd']:
            meta['enpd'] *= scale
    meta['wavelengths_um'] = [waves[k] for k in sorted(waves)]
    meta['primary_wave_um'] = waves.get(primary_idx) or (
        meta['wavelengths_um'][0] if meta['wavelengths_um'] else None)
    return surfaces, meta


def _glass_kwargs(surf, suffix=''):
    """Trace-model kwargs for the glass AFTER ``surf`` (Sellmeier from
    the catalog when the name is known, else the GLAS line's (nd, vd))."""
    from .glass import CATALOG, SELLMEIER, glass
    name = surf.glass.upper()
    if name in SELLMEIER:
        kw = glass(surf.glass, model='sellmeier')
        return {f'ior_glass{suffix}': kw['ior_glass'],
                f'sellmeier{suffix}': kw['sellmeier']}
    if name in CATALOG:
        kw = glass(surf.glass, model='abbe')
        return {f'ior_glass{suffix}': kw['ior_glass'],
                f'abbe_vd{suffix}': kw['abbe_vd']}
    if surf.nd is None:
        raise ValueError(
            f"surface {surf.index}: glass {surf.glass!r} is not in the "
            "catalog and its GLAS line carries no (nd, vd)")
    out = {f'ior_glass{suffix}': surf.nd}
    if surf.vd is not None:
        out[f'abbe_vd{suffix}'] = surf.vd
    return out


def _asphere_terms(surf):
    """(k, a) for an EVENASPH face: conic + (a4, a6, a8, a10)."""
    bad = [i for i in surf.parm if i not in (1, 2, 3, 4, 5)]
    if bad:
        raise ValueError(
            f'surface {surf.index}: even-asphere terms beyond r^10 '
            f'(PARM {sorted(bad)}) are not supported')
    if surf.parm.get(1, 0.0):
        raise ValueError(
            f'surface {surf.index}: a PARM 1 (r^2) asphere term has no '
            'exact counterpart here — fold it into CURV upstream')
    a = tuple(surf.parm.get(i, 0.0) for i in (2, 3, 4, 5))
    return surf.conic, (a if any(a) else ())


def _rx(a):
    import numpy as np
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def _ry(a):
    import numpy as np
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _rz(a):
    import numpy as np
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def _rotvec(M):
    """Axis-angle (Rodrigues) vector of a rotation matrix, or None for
    identity.  Matches geom/transform.py::rodrigues (local->world)."""
    import numpy as np
    c = (np.trace(M) - 1.0) / 2.0
    th = float(np.arccos(min(1.0, max(-1.0, c))))
    if th < 1e-12:
        return None
    if th > np.pi - 1e-4:
        # near/at 180 degrees (normal-incidence folds): the antisymmetric
        # part vanishes; read the axis off (M + I)/2 = axis axis^T
        A = (M + np.eye(3)) / 2.0
        k = int(np.argmax(np.diag(A)))
        v = A[:, k] / np.sqrt(max(float(A[k, k]), 1e-30))
        v = v / np.linalg.norm(v)
    else:
        v = np.array([M[2, 1] - M[1, 2], M[0, 2] - M[2, 0],
                      M[1, 0] - M[0, 1]]) / (2.0 * np.sin(th))
    return [float(th * x) for x in v]


def _cb_apply(o, M, s):
    """Apply a COORDBRK surface to the running frame (o, M).

    Zemax semantics: PARM 1/2 = x/y decenter (lens units), PARM 3/4/5 =
    tilts about x, y, z (DEGREES, right-handed, applied intrinsically in
    that order), PARM 6 = order flag (0: decenter then tilt; 1: tilts in
    reverse order z, y, x then decenter — so a (CB, negated-CB order 1)
    pair restores the frame exactly).  DISZ then advances along the NEW
    local z.
    """
    import numpy as np
    dx, dy = s.parm.get(1, 0.0), s.parm.get(2, 0.0)
    ax, ay, az = (np.deg2rad(s.parm.get(k, 0.0)) for k in (3, 4, 5))
    if int(s.parm.get(6, 0.0)) == 0:
        o = o + M @ np.array([dx, dy, 0.0])
        M = M @ _rx(ax) @ _ry(ay) @ _rz(az)
    else:
        M = M @ _rz(az) @ _ry(ay) @ _rx(ax)
        o = o + M @ np.array([dx, dy, 0.0])
    return o + M @ np.array([0.0, 0.0, s.disz]), M


def load_zmx(path_or_text, n_media=1.0):
    """Import a sequential ``.zmx`` prescription -> :class:`ZmxImport`.

    The returned ``scene`` is a ready ``SequentialScene``:
    lens groups (singlet / cemented doublet / triplet, spheric or even
    aspheric), the stop as a ``CircularAperture``, and the image plane
    as a ``SensorElement`` — placed by the cumulative DISZ gaps with
    surface 1 at z = 0.  COORDBRK surfaces tilt/decenter the running
    frame (``_cb_apply``), so perturbed/wedged prescriptions import with
    the correct element poses.
    """
    import numpy as np

    from ..elements.aperture import CircularAperture
    from ..elements.lens import (AsphericLens, DoubletLens, SingletLens,
                                 TripletLens)
    from ..elements.mirror import (AsphericMirror, ConicMirror,
                                   ManginMirror, SphericalMirror)
    from ..elements.sensor import SensorElement
    from ..scene.scene import SequentialScene

    surfaces, meta = parse_zmx(path_or_text)
    if meta['mode'] not in ('SEQ', ''):
        raise ValueError(f"only sequential (MODE SEQ) files are supported, "
                         f"got MODE {meta['mode']}")
    if not surfaces:
        raise ValueError('no SURF blocks found')
    for s in surfaces:
        if s.type == 'COORDBRK':
            if s.glass:
                raise ValueError(
                    f'surface {s.index}: GLAS on a TYPE COORDBRK surface '
                    'is not supported')
            continue
        if s.type not in _SUPPORTED_TYPES:
            raise ValueError(
                f'surface {s.index}: TYPE {s.type} not supported '
                f'(supported: {sorted(_SUPPORTED_TYPES)} + COORDBRK)')

    # object surface = index 0 (infinite or finite gap to surface 1)
    body = [s for s in surfaces if s.index > 0]
    if len(body) < 2:
        raise ValueError('need at least one surface plus the image plane')
    image = body[-1]

    elements = []
    o = np.zeros(3)               # running frame: CURRENT vertex position
    M = np.eye(3)                 # + local->world orientation (Zemax Z)
    parity = 1                    # -1 after an odd number of mirrors:
    i = 0                         # the beam then travels along -z_Z and
    n_lens = 0                    # the file's DISZ/CURV values negate
    n_mirror = 0
    FLIP = _ry(np.pi)             # beam-aligned element frame = M @ FLIP

    def pose_kw(local_z=0.0, beam_frame=False):
        """Element pose: center offset ``local_z`` along the CURRENT
        Zemax z (signed — callers pass raw DISZ sums so folds work
        unchanged); orientation = M, with the 180-degree flip composed
        in when ``beam_frame`` and parity < 0 (our elements expect the
        beam along their local +z; Zemax encodes reversed propagation
        as negative thicknesses instead)."""
        t = o + M @ np.array([0.0, 0.0, local_z])
        E = M @ FLIP if (beam_frame and parity < 0) else M
        kw = {'translation': [float(v) for v in t]}
        rv = _rotvec(E)
        if rv is not None:
            kw['rotation'] = rv
        return kw

    while i < len(body) - 1:      # image plane handled after the loop
        s = body[i]
        if s.type == 'COORDBRK':
            o, M = _cb_apply(o, M, s)
            i += 1
            continue
        if s.glass and s.glass.upper() in ('MIRROR', 'MIRR'):
            n_mirror += 1
            semi = s.semi_diam if s.semi_diam > 0 else \
                (meta['enpd'] or 10.0) / 2.0 * 1.4
            name = f'mirror{n_mirror}_s{s.index}'
            pose = pose_kw(beam_frame=True)
            if s.parm:
                # even-asphere mirror (EVENASPH + MIRROR): the conic and
                # polynomial terms ride AsphericMirror; sag terms negate
                # with mirror parity like lens aspheres do
                k, a = _asphere_terms(s)
                elements.append(AsphericMirror(
                    c1=parity * s.curv, d=2.0 * semi, k=k,
                    a=tuple(parity * x for x in a), name=name, **pose))
            elif s.conic:
                # conic mirror (Cassegrain / RC secondaries): the conic
                # constant is shape, invariant under the parity flip
                elements.append(ConicMirror(
                    c1=parity * s.curv, k=s.conic, d=2.0 * semi,
                    name=name, **pose))
            else:
                elements.append(SphericalMirror(
                    c1=parity * s.curv, d=2.0 * semi, name=name, **pose))
            parity = -parity
            o = o + M @ np.array([0.0, 0.0, s.disz])
            i += 1
            continue
        if s.glass is None:
            # bare surface: the STOP becomes a physical aperture; plain
            # dummy planes are pure spacing
            if s.is_stop and s.semi_diam > 0:
                if s.conic != 0.0:
                    raise ValueError(
                        f'surface {s.index}: conic stop not supported')
                elements.append(CircularAperture(
                    radius=s.semi_diam,
                    curvature=parity * s.curv,
                    name=f'stop_s{s.index}',
                    **pose_kw(beam_frame=True)))
            o = o + M @ np.array([0.0, 0.0, s.disz])
            i += 1
            continue
        # glass run: faces i .. j where j is the first surface back in air
        j = i
        while body[j].glass is not None:
            j += 1
            if j >= len(body) - 1:
                raise ValueError(
                    f'surface {body[i].index}: glass run reaches the '
                    'image plane (no closing air gap)')
        faces = body[i:j + 1]
        if any(f.type == 'COORDBRK' for f in faces):
            raise ValueError(
                f'surface {body[i].index}: coordinate break adjacent to '
                'a glass run (tilted cemented interfaces) not supported')
        mirror_in_run = [fi for fi, f in enumerate(faces)
                         if f.glass and f.glass.upper() in ('MIRROR',
                                                            'MIRR')]
        if mirror_in_run:
            # Mangin mirror: Zemax writes the double pass out explicitly
            # — front glass face (DISZ +t), silvered back face (DISZ -t,
            # the sign flip IS the reflection), the front face again
            # (back in air).  Fold the three surfaces onto ManginMirror
            # (elements/mirror.py), which builds the double-pass rows.
            if len(faces) != 3 or mirror_in_run != [1]:
                raise ValueError(
                    f'surface {faces[0].index}: only the simple Mangin '
                    'pattern (glass face, MIRROR back face, glass face '
                    'again) is supported inside a glass run')
            front, back, front2 = faces
            t_g = parity * front.disz
            if t_g <= 0:
                raise ValueError(
                    f'surface {front.index}: non-positive Mangin glass '
                    'thickness')
            if abs(back.disz + front.disz) > 1e-9 * max(abs(front.disz),
                                                        1.0):
                raise ValueError(
                    f'surface {back.index}: Mangin return thickness '
                    f'{back.disz} does not mirror the entry thickness '
                    f'{front.disz}')
            if abs(front2.curv - front.curv) > 1e-12 + 1e-9 * abs(
                    front.curv):
                raise ValueError(
                    f'surface {front2.index}: Mangin exit face curvature '
                    'differs from the entry face (wedged Mangin not '
                    'supported)')
            if any(f.conic or f.parm for f in faces):
                raise ValueError(
                    f'surface {front.index}: aspheric Mangin faces are '
                    'not supported')
            gkw = _glass_kwargs(front)
            semi = max(f.semi_diam for f in faces)
            if semi <= 0:
                semi = (meta['enpd'] or 10.0) / 2.0 * 1.1
            n_mirror += 1
            elements.append(ManginMirror(
                c1=parity * front.curv, c2=parity * back.curv,
                d=2.0 * semi, t=t_g, ior_glass=gkw['ior_glass'],
                name=f'mangin{n_mirror}_s{front.index}',
                **pose_kw(parity * t_g / 2.0, beam_frame=True)))
            parity = -parity
            o = o + M @ np.array([0.0, 0.0, front.disz + back.disz
                                  + front2.disz])
            i = j + 1
            continue
        n_faces = len(faces)
        # after an odd number of mirrors Zemax negates thicknesses and
        # keeps curvature signs in the ORIGINAL axis convention; our
        # beam-aligned element (pose flip) sees both negated
        curvs = [parity * f.curv for f in faces]
        ts_raw = [f.disz for f in faces[:-1]]
        ts = [parity * t for t in ts_raw]
        if any(t <= 0 for t in ts):
            raise ValueError(
                f'surface {faces[0].index}: non-positive glass thickness')
        semi = max(f.semi_diam for f in faces)
        if semi <= 0:
            semi = (meta['enpd'] or 10.0) / 2.0 * 1.1
        d = 2.0 * semi
        pose = pose_kw(sum(ts_raw) / 2.0,  # element center (vertices are
                       beam_frame=True)    # centered on sum(ts)/2)
        n_lens += 1
        name = f'lens{n_lens}_s{faces[0].index}'
        aspheric = any(f.conic or f.parm for f in faces)
        if n_faces == 2:
            gkw = _glass_kwargs(faces[0])
            if aspheric:
                k1, a1 = _asphere_terms(faces[0])
                k2, a2 = _asphere_terms(faces[1])
                a1 = tuple(parity * x for x in a1)
                a2 = tuple(parity * x for x in a2)
                elements.append(AsphericLens(
                    c1=curvs[0], c2=curvs[1], d=d, t=ts[0],
                    k1=k1, k2=k2, a1=a1, a2=a2, ior_media=n_media,
                    name=name, **pose, **gkw))
            else:
                elements.append(SingletLens(
                    c1=curvs[0], c2=curvs[1], d=d, t=ts[0],
                    ior_media=n_media, name=name, **pose, **gkw))
        elif n_faces == 3:
            if aspheric:
                raise ValueError(
                    f'surface {faces[0].index}: aspheric cemented '
                    'doublets are not supported')
            gkw = {**_glass_kwargs(faces[0], '1'),
                   **_glass_kwargs(faces[1], '2')}
            elements.append(DoubletLens(
                c1=curvs[0], c2=curvs[1], c3=curvs[2], d=d,
                t1=ts[0], t2=ts[1], ior_media=n_media,
                name=name, **pose, **gkw))
        elif n_faces == 4:
            if aspheric:
                raise ValueError(
                    f'surface {faces[0].index}: aspheric cemented '
                    'triplets are not supported')
            gkw = {**_glass_kwargs(faces[0], '1'),
                   **_glass_kwargs(faces[1], '2'),
                   **_glass_kwargs(faces[2], '3')}
            elements.append(TripletLens(
                c1=curvs[0], c2=curvs[1], c3=curvs[2], c4=curvs[3], d=d,
                t1=ts[0], t2=ts[1], t3=ts[2], ior_media=n_media,
                name=name, **pose, **gkw))
        else:
            raise ValueError(
                f'surface {faces[0].index}: cemented run of {n_faces} '
                'faces (max supported: 4 — a cemented triplet)')
        o = o + M @ np.array([0.0, 0.0, sum(ts_raw) + faces[-1].disz])
        i = j + 1

    sensor_r = image.semi_diam if image.semi_diam > 0 else \
        ((meta['enpd'] or 10.0))
    elements.append(SensorElement(radius=sensor_r, name='image',
                                  **pose_kw(beam_frame=True)))
    scene = SequentialScene(elements)
    return ZmxImport(scene=scene, elements=elements,
                     wavelengths_um=meta['wavelengths_um'],
                     primary_wave_um=meta['primary_wave_um'],
                     enpd=meta['enpd'], name=meta['name'],
                     surfaces=surfaces)


# ---------------------------------------------------------------------------
# Export
# ---------------------------------------------------------------------------

def _glass_name(el, suffix, nd):
    """Catalog name for an element's glass (reverse lookup), else a
    synthetic name whose (nd, vd) ride the GLAS line."""
    from .glass import CATALOG, SELLMEIER
    sell = getattr(el, 'sellmeier' + suffix, None)
    if sell is not None:
        for name, coeffs in SELLMEIER.items():
            if tuple(coeffs) == tuple(sell):
                return name, None
    vd = getattr(el, 'abbe_vd' + suffix, None)
    if vd is not None:
        for name, (cnd, cvd) in CATALOG.items():
            if abs(cnd - nd) < 5e-5 and abs(cvd - vd) < 5e-2:
                return name, vd
    return f'G{el.name.upper()}{suffix or ""}'[:16], vd


def save_zmx(scene, params, path=None, wavelengths_um=(0.5875618,),
             enpd=None, name='raytracetorch_tpu export'):
    """Export a sequential scene to Zemax ``.zmx`` text (UTF-8/ASCII).

    Takes the CURRENT ``params`` so optimized designs round-trip with
    their optimized curvatures/thicknesses/aspheres.  Supported
    elements: ``SingletLens`` / ``AsphericLens`` (conic + r^4..r^10
    terms), cemented ``DoubletLens`` / ``TripletLens``,
    ``CircularAperture`` (exported as the STOP), ``SensorElement``
    (the image plane, must be last).  Elements must be axial (no
    rotation, no x/y decenter) — anything else raises, the same
    import-or-fail contract as :func:`load_zmx`.  Returns the text;
    also writes it when ``path`` is given.
    """
    import numpy as np

    from ..elements.aperture import CircularAperture
    from ..elements.lens import (AsphericLens, CylSingletLens, DoubletLens,
                                 FreeformLens, SingletLens, TripletLens,
                                 ZernikeLens)
    from ..elements.sensor import SensorElement

    rows = []                    # (z_vertex, dict of per-surface lines)

    def f(x):
        return float(np.asarray(x))

    for el in scene.elements:
        p = params[el.name]
        trans = np.asarray(p['trans'], float)
        rot = np.asarray(p.get('rot_vec', [0.0, 0.0, 0.0]), float)
        if abs(trans[0]) > 1e-12 or abs(trans[1]) > 1e-12 or \
                np.abs(rot).max() > 1e-12:
            raise ValueError(
                f'element {el.name!r}: .zmx export supports axial '
                'systems only (no decenter/tilt)')
        zc = float(trans[2])
        if isinstance(el, (FreeformLens, ZernikeLens, CylSingletLens)):
            raise ValueError(
                f'element {el.name!r}: {type(el).__name__} has no '
                'supported .zmx surface type here')
        if isinstance(el, (DoubletLens, TripletLens)):
            tnames = ('t1', 't2') if isinstance(el, DoubletLens) \
                else ('t1', 't2', 't3')
            cnames = ('c1', 'c2', 'c3') if isinstance(el, DoubletLens) \
                else ('c1', 'c2', 'c3', 'c4')
            ts = [f(p[t]) for t in tnames]
            z = zc - sum(ts) / 2.0
            semi = f(p['radius'])
            for k, cn in enumerate(cnames):
                glas = None
                if k < len(ts):
                    sfx = str(k + 1)
                    nd = f(p['ior_glass' + sfx])
                    gname, vd = _glass_name(el, sfx, nd)
                    glas = (gname, nd, vd)
                rows.append((z, dict(curv=f(p[cn]), semi=semi, glas=glas)))
                if k < len(ts):
                    z += ts[k]
        elif isinstance(el, SingletLens):     # includes AsphericLens
            t = f(p['t'])
            z = zc - t / 2.0
            semi = f(p['radius'])
            nd = f(p['ior_glass'])
            gname, vd = _glass_name(el, '', nd)
            asph = isinstance(el, AsphericLens)
            for face in (1, 2):
                d = dict(curv=f(p[f'c{face}']), semi=semi,
                         glas=(gname, nd, vd) if face == 1 else None)
                if asph:
                    k = f(p[f'k{face}'])
                    a = [f(v) for v in np.asarray(p[f'a{face}'])]
                    if k or any(a):
                        d['conic'] = k
                        d['parm'] = {i + 2: a[i] for i in range(len(a))
                                     if a[i]}
                        d['type'] = 'EVENASPH'
                rows.append((z, d))
                z += t if face == 1 else 0.0
        elif isinstance(el, CircularAperture):
            rows.append((zc, dict(curv=0.0, semi=f(p['radius']),
                                  glas=None, stop=True)))
        elif isinstance(el, SensorElement):
            r = p.get('radius')
            semi = f(r) if r is not None else f(p.get('half_x', 1.0))
            rows.append((zc, dict(curv=0.0, semi=semi, glas=None,
                                  image=True)))
        else:
            raise ValueError(
                f'element {el.name!r}: {type(el).__name__} is not '
                'exportable to .zmx')

    if not rows:
        raise ValueError('empty scene')
    zs = [z for z, _ in rows]
    if any(b < a - 1e-9 for a, b in zip(zs, zs[1:])):
        raise ValueError('elements are not in increasing-z order')
    if not rows[-1][1].get('image'):
        raise ValueError('the last element must be the SensorElement '
                         '(image plane)')

    out = [f'NAME {name}', 'MODE SEQ', 'UNIT MM X W X CM MR CPMM']
    if enpd:
        out.append(f'ENPD {enpd:.9g}')
    for i, w in enumerate(wavelengths_um, start=1):
        out.append(f'WAVM {i} {w:.9g} 1')
    out.append('SURF 0')
    out.append('  TYPE STANDARD')
    out.append('  DISZ INFINITY')
    for i, (z, d) in enumerate(rows, start=1):
        disz = (zs[i] - z) if i < len(rows) else 0.0
        out.append(f'SURF {i}')
        out.append(f"  TYPE {d.get('type', 'STANDARD')}")
        if d.get('stop'):
            out.append('  STOP')
        out.append(f"  CURV {d['curv']:.12g}")
        if d.get('conic'):
            out.append(f"  CONI {d['conic']:.12g}")
        for pi, pv in sorted(d.get('parm', {}).items()):
            out.append(f'  PARM {pi} {pv:.12g}')
        out.append(f'  DISZ {disz:.9g}')
        if d['glas'] is not None:
            gname, nd, vd = d['glas']
            out.append(f'  GLAS {gname} 0 0 {nd:.9g} {0.0 if vd is None else vd:.9g}')
        out.append(f"  DIAM {d['semi']:.9g} 1 0 0 1 \"\"")
    text = '\n'.join(out) + '\n'
    if path is not None:
        with open(path, 'w') as fh:
            fh.write(text)
    return text
