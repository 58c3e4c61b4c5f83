"""Per-particle ML feature extraction and region analysis.

Behavioral port of ``source/plugin/tfplugins.cpp``: knExtractFeatureVel/Phi/
Geo (:40-120 — (2w+1)^d stencil samples around each particle, written into a
row-major feature matrix), floodFillRegion/getRegions (:155-178),
getRegionalCounts (:180), extendRegion (:190). Region labelling uses
iterative label propagation (min-label flooding) instead of recursive
flood fill — same components, parallel-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import flags as fl
from ..core.domain import Domain
from ..core.interp import interpol, interpol_mac
from ..core.masks import shift
from ..core.particles import Particles


def _stencil_offsets(window: int, is3d: bool):
    ks = range(-window, window + 1) if is3d else [0]
    return [(i, j, k) for i in range(-window, window + 1)
            for j in range(-window, window + 1) for k in ks]


def extract_feature_vel(parts: Particles, vel, dom: Domain,
                        scale: float = 1.0, window: int = 1, ptype=None,
                        exclude: int = 0):
    """(N, stencil*3) matrix of MAC velocities sampled around each particle."""
    offs = _stencil_offsets(window, dom.is3d)
    cols = []
    pos = parts.pos
    for (i, j, k) in offs:
        u, v, w = interpol_mac(vel, pos[:, 0] + i, pos[:, 1] + j,
                               pos[:, 2] + k)
        cols += [u * scale, v * scale, w * scale]
    feat = jnp.stack(cols, axis=-1)
    act = parts.active_mask()
    if ptype is not None:
        act = act & ((ptype & exclude) == 0)
    return jnp.where(act[:, None], feat, 0.0)


def extract_feature_phi(parts: Particles, phi, dom: Domain,
                        scale: float = 1.0, window: int = 1, ptype=None,
                        exclude: int = 0):
    offs = _stencil_offsets(window, dom.is3d)
    pos = parts.pos
    cols = [interpol(phi, pos[:, 0] + i, pos[:, 1] + j, pos[:, 2] + k) * scale
            for (i, j, k) in offs]
    feat = jnp.stack(cols, axis=-1)
    act = parts.active_mask()
    if ptype is not None:
        act = act & ((ptype & exclude) == 0)
    return jnp.where(act[:, None], feat, 0.0)


def extract_feature_geo(parts: Particles, flags, dom: Domain,
                        scale: float = 1.0, window: int = 1, ptype=None,
                        exclude: int = 0):
    """Stencil of flag values at the containing cells (getAt semantics)."""
    offs = _stencil_offsets(window, dom.is3d)
    sz, sy, sx = dom.shape
    pos = parts.pos
    cols = []
    for (i, j, k) in offs:
        ci = jnp.clip((pos[:, 0] + i).astype(jnp.int32), 0, sx - 1)
        cj = jnp.clip((pos[:, 1] + j).astype(jnp.int32), 0, sy - 1)
        ck = jnp.clip((pos[:, 2] + k).astype(jnp.int32), 0, sz - 1)
        cols.append(flags[ck, cj, ci].astype(jnp.float32) * scale)
    feat = jnp.stack(cols, axis=-1)
    act = parts.active_mask()
    if ptype is not None:
        act = act & ((ptype & exclude) == 0)
    return jnp.where(act[:, None], feat, 0.0)


def get_regions(flags, dom: Domain, ctype: int):
    """Connected components of cells matching ctype (4/6-connectivity).
    Returns (labels int32 [z,y,x] with 0 = background, n_regions).

    Label-propagation: init each member cell with its flat index + 1, then
    iteratively take the min over member neighbors until fixpoint. Component
    ids are then densified. Labels differ from the reference's visit order
    but partition identically.
    """
    member = (flags & ctype) != 0
    n = dom.shape[0] * dom.shape[1] * dom.shape[2]
    init = jnp.where(member,
                     jnp.arange(1, n + 1, dtype=jnp.int32).reshape(dom.shape),
                     jnp.int32(0))
    big = jnp.int32(n + 2)

    def body(c):
        lab, _ = c
        m = jnp.where(member, lab, big)
        best = m
        for ax in (["x", "y", "z"] if dom.is3d else ["x", "y"]):
            for d in (1, -1):
                nb = shift(m, d, ax)
                # forbid wraparound neighbors
                from ..core.masks import axis_index
                idx = axis_index(dom, ax)
                nax = dom.shape[{"x": 2, "y": 1, "z": 0}[ax]]
                ok = (idx + d >= 0) & (idx + d < nax)
                best = jnp.minimum(best, jnp.where(ok, nb, big))
        new = jnp.where(member, jnp.minimum(lab, best), 0)
        changed = jnp.any(new != lab)
        return new, changed

    def cond(c):
        return c[1]

    labels, _ = jax.lax.while_loop(cond, body, (init, jnp.array(True)))
    # densify ids to 1..n_regions (pad unique with a sentinel LARGER than any
    # label so the padded array stays sorted for searchsorted)
    flat = labels.reshape(-1)
    sentinel = jnp.int32(n + 5)
    uniq = jnp.unique(flat, size=n // 2 + 2, fill_value=sentinel)
    n_regions = jnp.sum((uniq > 0) & (uniq < sentinel))
    dense = jnp.searchsorted(uniq, flat)
    dense = jnp.where(flat > 0, dense, 0).astype(jnp.int32)
    return dense.reshape(dom.shape), n_regions


def get_regional_counts(flags, dom: Domain, ctype: int):
    """Replace each region label by its cell count (getRegionalCounts)."""
    labels, _ = get_regions(flags, dom, ctype)
    n = dom.shape[0] * dom.shape[1] * dom.shape[2]
    flat = labels.reshape(-1)
    counts = jnp.zeros((n // 2 + 2,), jnp.int32).at[flat].add(
        (flat > 0).astype(jnp.int32))
    return counts[flat].reshape(dom.shape)


def extend_region(flags, dom: Domain, region: int, exclude: int, depth: int):
    """Grow `region` bits into non-excluded neighbors `depth` times."""
    out = flags
    for _ in range(depth):
        has_nb = jnp.zeros(dom.shape, dtype=bool)
        src = (out & region) != 0
        for ax in (["x", "y", "z"] if dom.is3d else ["x", "y"]):
            from ..core.masks import axis_index
            idx = axis_index(dom, ax)
            nax = dom.shape[{"x": 2, "y": 1, "z": 0}[ax]]
            for d in (1, -1):
                ok = (idx + d >= 0) & (idx + d < nax)
                has_nb = has_nb | (shift(src, d, ax) & ok)
        grow = has_nb & ((out & exclude) == 0) & ~src
        out = jnp.where(grow, out | region, out)
    return out
