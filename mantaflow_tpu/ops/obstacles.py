"""Second-order obstacle boundaries and moving obstacles.

Behavioral port of ``source/plugin/initplugins.cpp`` updateFractions
(:356-440, incl. calcFraction), setObstacleFlags/KnUpdateFlagsObs
(:442-476), kninitVortexVelocity (:480-501), and ``source/movingobs.cpp``
MovingObstacle::moveLinear (:60-93) / projectOutside (:43-57).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import flags as fl
from ..core.domain import Domain
from ..core.masks import axis_index, interior_mask, shift


def _calc_fraction(phi1, phi2, frac_threshold: float):
    """Face fluid fraction from the two adjacent obstacle-SDF values."""
    both_pos = (phi1 > 0) & (phi2 > 0)
    both_neg = (phi1 < 0) & (phi2 < 0)
    lo = jnp.minimum(phi1, phi2)
    hi = jnp.maximum(phi1, phi2)
    denom = lo - hi
    frac = jnp.where(denom > -1e-4, 0.5,
                     jnp.minimum(1.0, 1.0 - lo / jnp.where(denom > -1e-4,
                                                           -1.0, denom)))
    frac = jnp.where(frac < frac_threshold, 0.0, frac)
    return jnp.where(both_pos, 1.0, jnp.where(both_neg, 0.0, frac))


def update_fractions(flags, phi_obs, dom: Domain, boundary_width: int = 0,
                     frac_threshold: float = 0.01):
    """updateFractions: per-face fluid fractions from the obstacle SDF, with
    open/in/outflow domain borders forced to 1."""
    inter = interior_mask(dom, 1)
    fx = jnp.where(inter, _calc_fraction(phi_obs, shift(phi_obs, -1, "x"),
                                         frac_threshold), 0.0)
    fy = jnp.where(inter, _calc_fraction(phi_obs, shift(phi_obs, -1, "y"),
                                         frac_threshold), 0.0)
    if dom.is3d:
        fz = jnp.where(inter, _calc_fraction(phi_obs, shift(phi_obs, -1, "z"),
                                             frac_threshold), 0.0)
    else:
        fz = jnp.zeros_like(fx)
    fr = jnp.stack([fx, fy, fz])

    # open domain borders: set faces fully open next to in/out/open cells
    w = boundary_width
    openish = fl.is_inflow(flags) | fl.is_outflow(flags) | fl.is_open(flags)
    not_in_obs = phi_obs >= 0.0
    sz, sy, sx = dom.shape
    axes = [("x", sx), ("y", sy)] + ([("z", sz)] if dom.is3d else [])
    ones = jnp.ones(dom.shape, jnp.float32)
    for ax, n in axes:
        idx = axis_index(dom, ax)
        lo_band = inter & not_in_obs & (idx <= w + 1) & shift(openish, -1, ax)
        hi_band = inter & not_in_obs & (idx >= n - w - 2) & shift(openish, 1, ax)
        # lower band: set the cell's own faces; upper band: the +1 face cell
        set_here = lo_band
        set_up = shift(hi_band, -1, ax)  # cell i+1 receives the setting
        m = set_here | set_up
        fr = jnp.where(m[None], 1.0, fr)
        if not dom.is3d:
            fr = fr.at[2].set(jnp.zeros(dom.shape, jnp.float32))
    return fr


def set_obstacle_flags(flags, phi_obs, dom: Domain, fractions=None,
                       phi_out=None, phi_in=None, boundary_width: int = 1):
    """setObstacleFlags: retype cells wholesale from levelsets/fractions."""
    if fractions is not None:
        f = (fractions[0] + shift(fractions[0], 1, "x")
             + fractions[1] + shift(fractions[1], 1, "y"))
        if dom.is3d:
            f = f + fractions[2] + shift(fractions[2], 1, "z")
        is_obs = f == 0.0
    else:
        is_obs = phi_obs < 0.0
    is_out = (phi_out < 0.0) if phi_out is not None else jnp.zeros(dom.shape, bool)
    is_in = (phi_in < 0.0) if phi_in is not None else jnp.zeros(dom.shape, bool)

    new = jnp.where(is_obs, fl.TypeObstacle,
                    jnp.where(is_in, fl.TypeFluid | fl.TypeInflow,
                              jnp.where(is_out, fl.TypeEmpty | fl.TypeOutflow,
                                        fl.TypeEmpty))).astype(jnp.int32)
    inter = interior_mask(dom, boundary_width)
    return jnp.where(inter, new, flags)


def init_vortex_velocity(phi_obs, dom: Domain, center, radius: float):
    """kninitVortexVelocity: solid-rotation MAC field outside obstacles."""
    sz, sy, sx = dom.shape
    i = jnp.broadcast_to(jnp.arange(sx, dtype=jnp.float32).reshape(1, 1, sx),
                         dom.shape)
    j = jnp.broadcast_to(jnp.arange(sy, dtype=jnp.float32).reshape(1, sy, 1),
                         dom.shape)
    ok = phi_obs >= -1.0

    dx = i - center[0]
    dx = jnp.where(dx >= 0, dx - 0.5, dx + 0.5)
    dy = j - center[1]
    r = jnp.sqrt(dx * dx + dy * dy)
    alpha = jnp.arctan2(dy, dx)
    u = jnp.where(ok, -jnp.sin(alpha) * (r / radius), 0.0)

    dx2 = i - center[0]
    dy2 = j - center[1]
    dy2 = jnp.where(dy2 >= 0, dy2 - 0.5, dy2 + 0.5)
    r2 = jnp.sqrt(dx2 * dx2 + dy2 * dy2)
    alpha2 = jnp.arctan2(dy2, dx2)
    v = jnp.where(ok, jnp.cos(alpha2) * (r2 / radius), 0.0)
    return jnp.stack([u, v, jnp.zeros_like(u)])


# ---------------------------------------------------------------------------
# moving obstacles (movingobs.h/.cpp)

class MovingObstacleState:
    """Linear-motion obstacle: stamps flags with a private id bit and writes
    obstacle velocity on its faces each frame."""

    _next_id_bit = 10

    def __init__(self, dom: Domain, empty_type: int = fl.TypeEmpty):
        self.dom = dom
        self.empty_type = empty_type
        if MovingObstacleState._next_id_bit > 15:
            raise RuntimeError("only 5 separate moving obstacles supported")
        self.id_bit = 1 << MovingObstacleState._next_id_bit
        MovingObstacleState._next_id_bit += 1
        self.shapes = []

    def add(self, shape):
        self.shapes.append(shape)

    def move_linear(self, t, t0, t1, p0, p1, flags, vel, dt,
                    smooth: bool = True):
        """moveLinear (movingobs.cpp:60-93). Returns (flags, vel)."""
        alpha = (t - t0) / (t1 - t0)
        if not (0.0 <= alpha <= 1.0):
            return flags, vel
        v = tuple((b - a) / ((t1 - t0) * dt) for a, b in zip(p0, p1))
        if smooth:
            v = tuple(c * 6.0 * (alpha - alpha ** 2) for c in v)
            alpha = alpha * alpha * (3.0 - 2.0 * alpha)
        pos = tuple(alpha * b + (1.0 - alpha) * a for a, b in zip(p0, p1))

        # clear previous stamp
        mine = (flags & self.id_bit) != 0
        flags = jnp.where(mine, jnp.int32(self.empty_type), flags)
        # stamp shapes at the new position
        for shape in self.shapes:
            shape.center = pos
            inside = shape.inside_grid(self.dom)
            flags = jnp.where(inside, jnp.int32(fl.TypeObstacle | self.id_bit),
                              flags)
        # write obstacle velocity on faces touching the stamp
        mine = (flags & self.id_bit) != 0
        inter = interior_mask(self.dom, 1)
        comps = []
        for c, ax in enumerate(["x", "y", "z"]):
            hit = inter & (mine | shift(mine, -1, ax))
            comps.append(jnp.where(hit, v[c], vel[c]))
        return flags, jnp.stack(comps)

    def project_outside(self, flags, parts, dom: Domain):
        """projectOutside (movingobs.cpp:43-57): push particles out along
        the gradient of the obstacle levelset."""
        from . import levelset as lso
        phi = jnp.where(fl.is_obstacle(flags), -0.5, 0.5)
        phi = lso.reinit(phi, flags, dom, max_time=6.0, ignore_walls=True,
                         obstacle_type=fl.TypeReserved)
        from ..core.particles import push_out_of_obs
        # phi is negative inside obstacles and increases outward, so the
        # generic push-out (moves along +grad where phi<thresh) applies
        return push_out_of_obs(parts, flags, phi, dom, shift=0.5, thresh=0.0)
