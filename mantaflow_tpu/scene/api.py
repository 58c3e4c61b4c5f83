"""Mantaflow-style scene API.

This is the equivalent of the reference's generated Python binding layer
(``source/pwrapper/``, ``source/preprocessor/``): reference scenes written
against ``from manta import *`` port line-by-line against
``from mantaflow_tpu import *``. Objects here are thin imperative wrappers —
a grid holds one jnp array and ops re-bind it — while all math lives in the
pure functional core (``mantaflow_tpu.core`` / ``.ops``), which is what the
fused ``models/`` pipelines jit directly.

Design note: the reference needs ~2.7k LoC of C++ plus a code generator for
this layer (SURVEY.md §2.4-2.5); with Python as the host language it is a
plain module, as the survey's TPU mapping prescribes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import flags as fl
from ..core import mac as macops
from ..core import shapes as shp
from ..core import solver as slv
from ..core.domain import Domain
from ..ops import advection as adv
from ..ops import extforces as ext
from ..ops import initops as ini
from ..ops import pressure as prs
from ..utils.noise import WaveletNoiseField

# ---------------------------------------------------------------------------
# module constants mirroring registry.cpp:395-420 + defines.py:25-60

GUI = False


class Gui:
    """Headless stand-in for the Qt GUI (gui/qtmain.cpp, SURVEY §2.9): the
    reference guards GUI use behind `if (GUI):`, which is False here, but
    scenes that construct one unconditionally still run — interaction calls
    are no-ops and screenshot() renders a grid slice to PPM instead of a
    framebuffer grab."""

    def __init__(self):
        self._grids = []

    def show(self, twoD: bool = False):
        mantaMsg("Gui: headless build, rendering via projectPpmFull/"
                 "screenshot(grid=...)", 2)

    def pause(self):
        pass

    def update(self):
        pass

    def setCamPos(self, x, y, z):
        pass

    def setCamRot(self, x, y, z):
        pass

    def windowSize(self, w, h):
        pass

    def nextRealGrid(self):
        pass

    def nextVec3Grid(self):
        pass

    def nextParts(self):
        pass

    def nextPdata(self):
        pass

    def nextMesh(self):
        pass

    def toggleHideGrids(self):
        pass

    def screenshot(self, filename: str, grid=None, scale: float = 1.0):
        if grid is None:
            mantaMsg("Gui.screenshot: no framebuffer in the headless build; "
                     "pass grid=<RealGrid> to render a slice", 1)
            return
        from .io_api import projectPpmFull
        projectPpmFull(grid, filename, 0, scale)
CUDA = False
TPU = True
DOUBLEPRECISION = False

FlagFluid = fl.TypeFluid
FlagObstacle = fl.TypeObstacle
FlagEmpty = fl.TypeEmpty
FlagInflow = fl.TypeInflow
FlagOutflow = fl.TypeOutflow
FlagOpen = fl.TypeOpen
FlagStick = fl.TypeStick
FlagSurface = fl.TypeSurface

PcNone = prs.PcNone
PcMIC = prs.PcMIC
PcMGDynamic = prs.PcMGDynamic
PcMGStatic = prs.PcMGStatic

IntEuler = 0
IntRK2 = 1
IntRK4 = 2


class vec3(tuple):
    """Mantaflow's Vec3 scripting type (pwrapper/pvec3.cpp behavior)."""

    def __new__(cls, x, y=None, z=None):
        if y is None:
            y = z = x
        return super().__new__(cls, (float(x), float(y), float(z)))

    @property
    def x(self):
        return self[0]

    @property
    def y(self):
        return self[1]

    @property
    def z(self):
        return self[2]

    def __mul__(self, o):
        if isinstance(o, (tuple, list)):
            return vec3(self[0] * o[0], self[1] * o[1], self[2] * o[2])
        return vec3(self[0] * o, self[1] * o, self[2] * o)

    __rmul__ = __mul__

    def __add__(self, o):
        if isinstance(o, (tuple, list)):
            return vec3(self[0] + o[0], self[1] + o[1], self[2] + o[2])
        return vec3(self[0] + o, self[1] + o, self[2] + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, (tuple, list)):
            return vec3(self[0] - o[0], self[1] - o[1], self[2] - o[2])
        return vec3(self[0] - o, self[1] - o, self[2] - o)

    def __truediv__(self, o):
        if isinstance(o, (tuple, list)):
            return vec3(self[0] / o[0], self[1] / o[1], self[2] / o[2])
        return vec3(self[0] / o, self[1] / o, self[2] / o)

    def __neg__(self):
        return vec3(-self[0], -self[1], -self[2])


Vec3 = vec3  # manta exposes both spellings


def Vec4(x, y=None, z=None, t=None):
    """4-component vector literal for the Grid4d API (vector.h Vec4)."""
    if y is None:
        y = z = t = x
    return (float(x), float(y), float(z), float(t))


vec4 = Vec4  # manta exposes both spellings


def vec3i(x, y=None, z=None):
    if y is None:
        y = z = x
    return (int(x), int(y), int(z))


def mantaMsg(msg, level: int = 1):
    if level <= _debug_level[0]:
        print(msg)


_debug_level = [1]


def setDebugLevel(level: int):
    _debug_level[0] = int(level)


# ---------------------------------------------------------------------------
# grids

def _resolve_parent(solver, parent):
    """The reference's generated constructors accept the owning solver as a
    `parent` kwarg on every PbClass (pwrapper/pclass.h:44); mirror that."""
    return solver if solver is not None else parent


class GridBase:
    dtype = jnp.float32
    channels = 0  # 0: scalar [z,y,x]; 3: (3,z,y,x)

    def __init__(self, solver: "Solver" = None, name: str = "",
                 parent: "Solver" = None):
        solver = _resolve_parent(solver, parent)
        self.solver = solver
        self.name = name
        dom = solver.domain
        shape = dom.shape if self.channels == 0 else (3,) + dom.shape
        self.data = jnp.zeros(shape, dtype=self.dtype)

    # -- mantaflow Grid<T> surface (grid.h:99-247) --------------------------
    @property
    def dom(self) -> Domain:
        return self.solver.domain

    def clear(self):
        self.data = jnp.zeros_like(self.data)

    def setConst(self, value):
        if self.channels == 3:
            v = jnp.broadcast_to(
                jnp.asarray(value, self.dtype).reshape(3, 1, 1, 1), self.data.shape)
            self.data = v
        else:
            self.data = jnp.full_like(self.data, value)

    def copyFrom(self, other):
        self.data = other.data

    def add(self, other):
        self.data = self.data + other.data

    def sub(self, other):
        self.data = self.data - other.data

    def _const(self, v):
        """Normalize scalar/vec3 constants: a Vec3 on a 3-channel grid
        broadcasts per component (Grid<Vec3> scalar-op semantics)."""
        if self.channels == 3 and hasattr(v, "__len__") and len(v) == 3:
            return jnp.asarray([v[0], v[1], v[2]],
                               self.dtype).reshape(3, 1, 1, 1)
        return v

    def addConst(self, v):
        self.data = self.data + self._const(v)

    def addScaled(self, other, factor):
        self.data = self.data + self._const(factor) * other.data

    def mult(self, other):
        self.data = self.data * other.data

    def multConst(self, v):
        self.data = self.data * self._const(v)

    def clamp(self, vmin, vmax):
        self.data = jnp.clip(self.data, vmin, vmax)

    def clamp_norm(self, max_norm: float):
        """Grid::clamp_norm (fork, grid.h:191) for Vec3/MAC grids."""
        from .ops2 import clampNorm
        clampNorm(self, max_norm)

    def getMax(self):
        if self.channels == 3:
            # Grid<Vec3>::getMax = sqrt(max norm^2) (grid.cpp:361)
            return self.getMaxAbs()
        return float(jnp.max(self.data))

    def getMin(self):
        if self.channels == 3:
            # Grid<Vec3>::getMin = sqrt(min norm^2) (grid.cpp:364)
            return float(jnp.sqrt(jnp.min(
                self.data[0] ** 2 + self.data[1] ** 2 + self.data[2] ** 2)))
        return float(jnp.min(self.data))

    def getMaxAbs(self):
        if self.channels == 3:
            return float(jnp.sqrt(jnp.max(
                self.data[0] ** 2 + self.data[1] ** 2 + self.data[2] ** 2)))
        return float(jnp.max(jnp.abs(self.data)))

    def getL1(self, bnd: int = 0):
        return float(jnp.sum(jnp.abs(self._interior(bnd))))

    def getL2(self, bnd: int = 0):
        return float(jnp.sqrt(jnp.sum(self._interior(bnd) ** 2)))

    def _interior(self, bnd):
        if bnd <= 0:
            return self.data
        from ..core.masks import interior_mask
        m = interior_mask(self.dom, bnd)
        if self.channels == 3:
            m = m[None]
        return jnp.where(m, self.data, 0.0)

    def setBoundNeumann(self, boundaryWidth: int = 0):
        """Copy the first interior layer into the boundary shells
        (Grid::setBoundNeumann, grid.cpp:667)."""
        from ..core.masks import axis_index
        from ..core.masks import shift as _shift
        out = self.data
        dom = self.dom
        w = boundaryWidth
        for ax, n in (("x", dom.shape[2]), ("y", dom.shape[1]),
                      ("z", dom.shape[0])):
            if ax == "z" and not dom.is3d:
                continue
            idx = axis_index(dom, ax)
            for layer in range(w + 1):
                lo = idx == (w - layer)
                hi = idx == (n - 1 - w + layer)
                if self.channels == 3:
                    lo, hi = lo[None], hi[None]
                out = jnp.where(lo, _shift(out, 1, ax), out)
                out = jnp.where(hi, _shift(out, -1, ax), out)
        self.data = out

    def setBound(self, value, boundaryWidth: int = 1):
        from ..core.masks import interior_mask
        m = interior_mask(self.dom, boundaryWidth)
        if self.channels == 3:
            m = m[None]
            if isinstance(value, (tuple, list)):
                value = jnp.asarray(value, jnp.float32).reshape(3, 1, 1, 1)
        self.data = jnp.where(m, self.data, value)

    # numpy interop (numpyconvert.cpp equivalents)
    def to_numpy(self):
        return np.asarray(self.data)

    def from_numpy(self, arr):
        self.data = jnp.asarray(arr, dtype=self.dtype).reshape(self.data.shape)


class RealGrid(GridBase):
    dtype = jnp.float32


class IntGrid(GridBase):
    dtype = jnp.int32


class Vec3Grid(GridBase):
    dtype = jnp.float32
    channels = 3


class MACGrid(Vec3Grid):
    def getCentered(self):
        g = Vec3Grid(self.solver)
        g.data = macops.get_centered(self.data)
        return g

    def setBoundMAC(self, value, boundaryWidth: int, normalOnly=False):
        """MACGrid::setBoundMAC (grid.h:290, knSetBoundaryMAC /
        knSetBoundaryMACNorm grid.cpp:672-686): Dirichlet on a w-cell
        boundary shell, respecting staggered face locations."""
        sz, sy, sx = self.dom.shape
        w = int(boundaryWidth)
        i = jnp.arange(sx).reshape(1, 1, sx)
        j = jnp.arange(sy).reshape(1, sy, 1)
        k = jnp.arange(sz).reshape(sz, 1, 1)
        is3d = self.dom.is3d
        v = jnp.asarray(tuple(value), jnp.float32)
        if normalOnly:
            mx = (i <= w) | (i >= sx - w)
            my = (j <= w) | (j >= sy - w)
            mz = ((k <= w) | (k >= sz - w)) if is3d \
                else jnp.zeros((sz, 1, 1), bool)
        else:
            zb = ((k <= w - 1) | (k >= sz - 1 - w)) if is3d \
                else jnp.zeros((sz, 1, 1), bool)
            mx = ((i <= w) | (i >= sx - w)
                  | (j <= w - 1) | (j >= sy - 1 - w) | zb)
            my = ((i <= w - 1) | (i >= sx - 1 - w)
                  | (j <= w) | (j >= sy - w) | zb)
            mz = ((i <= w - 1) | (i >= sx - 1 - w)
                  | (j <= w - 1) | (j >= sy - 1 - w)
                  | ((k <= w) | (k >= sz - w))) if is3d \
                else jnp.zeros((sz, 1, 1), bool)
        d = self.data
        self.data = jnp.stack([
            jnp.where(mx, v[0], d[0]),
            jnp.where(my, v[1], d[1]),
            jnp.where(mz, v[2], d[2]) if (is3d or not normalOnly)
            else d[2]])

    def set_bound_MAC2(self, value, boundaryWidth: int):
        """Fork MACGrid::set_bound_MAC2 (grid.h:292, kn_set_bound_MAC2
        grid.cpp:695-714): like setBoundMAC but with one extra low-side
        layer on each component's own axis (wall faces of boundary
        cells). Used by zflip's moving obstacle to zero the obstacle
        velocity grid at the domain walls (zflip.py:765)."""
        sz, sy, sx = self.dom.shape
        w = int(boundaryWidth)
        i = jnp.arange(sx).reshape(1, 1, sx)
        j = jnp.arange(sy).reshape(1, sy, 1)
        k = jnp.arange(sz).reshape(sz, 1, 1)
        is3d = self.dom.is3d
        v = jnp.asarray(tuple(value), jnp.float32)
        zb = ((k <= w) | (k >= sz - 1 - w)) if is3d \
            else jnp.zeros((sz, 1, 1), bool)
        mx = ((i <= w + 1) | (i >= sx - 1 - w)
              | (j <= w) | (j >= sy - 1 - w) | zb)
        my = ((i <= w) | (i >= sx - 1 - w)
              | (j <= w + 1) | (j >= sy - 1 - w) | zb)
        mz = ((i <= w) | (i >= sx - 1 - w)
              | (j <= w) | (j >= sy - 1 - w)
              | ((k <= w + 1) | (k >= sz - 1 - w))) if is3d \
            else jnp.zeros((sz, 1, 1), bool)
        d = self.data
        self.data = jnp.stack([
            jnp.where(mx, v[0], d[0]),
            jnp.where(my, v[1], d[1]),
            jnp.where(mz, v[2], d[2]) if is3d else d[2]])


class LevelsetGrid(RealGrid):
    def __init__(self, solver=None, name: str = "", parent=None):
        solver = _resolve_parent(solver, parent)
        super().__init__(solver, name)
        self.data = jnp.full(solver.domain.shape,
                             self.invalidTimeValue(), dtype=self.dtype)

    def invalidTimeValue(self):
        # reference: FastMarch invalid value = 4.0 * max reinit time
        return 1e10

    def join(self, other):
        self.data = jnp.minimum(self.data, other.data)

    def subtract(self, other, flags=None, subtractType=None):
        """KnSubtract (levelset.cpp:114): where other<0 overwrite with
        -other; NOT a CSG max(a,-b) — cells outside `other` keep their
        value (the reference comment: 'does not preserve SDF')."""
        mask = other.data < 0.0
        if flags is not None and subtractType is not None:
            mask = mask & ((flags.data & subtractType) != 0)
        self.data = jnp.where(mask, -other.data, self.data)

    def initFromFlags(self, flags, ignore_walls: bool = False):
        inside = fl.is_fluid(flags.data)
        if ignore_walls:
            inside = inside | fl.is_obstacle(flags.data)
        self.data = jnp.where(inside, -0.5, 0.5)

    def reinitMarching(self, flags, maxTime: float = 4.0, velTransport=None,
                       ignoreWalls: bool = False,
                       correctOuterLayer: bool = True,
                       obstacleType: int = fl.TypeObstacle):
        """reinitMarching (levelset.cpp:224): reference-exact serial fast
        march with velocity value-transport via the native C++ extension
        (mantaflow_tpu/native); falls back to the parallel-redistancing
        JAX path (ops/levelset.py) when native code is unavailable."""
        import numpy as np
        from .. import native
        try:
            new_phi, new_vel = native.reinit_march(
                np.asarray(self.data), np.asarray(flags.data),
                np.asarray(velTransport.data)
                if velTransport is not None else None,
                maxTime, ignoreWalls, correctOuterLayer, obstacleType)
            self.data = jnp.asarray(new_phi)
            if velTransport is not None and new_vel is not None:
                velTransport.data = jnp.asarray(new_vel)
            return
        except RuntimeError:
            pass
        from ..ops import levelset as lso
        new_phi, new_vel = lso.reinit_marching(
            self.data, flags.data, self.dom,
            velTransport.data if velTransport is not None else None,
            maxTime, ignoreWalls, correctOuterLayer, obstacleType)
        self.data = new_phi
        if velTransport is not None:
            velTransport.data = new_vel

    def fillHoles(self, maxDepth: int = 10, boundaryWidth: int = 1):
        from ..ops import levelset as lso
        self.data = lso.fill_holes(self.data, self.dom, maxDepth)


class FlagGrid(IntGrid):
    def initDomain(self, boundaryWidth: int = 0, phiWalls=None,
                   wall: str = "xXyYzZ", open: str = "      ",
                   inflow: str = "      ", outflow: str = "      "):
        self.data = fl.init_domain(self.dom, boundaryWidth, wall, open,
                                   inflow, outflow)
        if phiWalls is not None:
            # obstacle SDF of the wall shells (InitMin/Max*Wall); only sides
            # that remain obstacle get a wall (grid.cpp: initDomain skips
            # open/inflow/outflow sides when stamping phiWalls)
            eff = "".join(c for c in wall
                          if c not in open + inflow + outflow)
            phiWalls.data = _wall_sdf(self.dom, boundaryWidth, eff)

    def fillGrid(self, type: int = fl.TypeFluid):
        self.data = fl.fill_grid(self.data, type)

    def updateFromLevelset(self, levelset):
        self.data = fl.update_from_levelset(self.data, levelset.data,
                                            levelset.invalidTimeValue())

    def countCells(self, flag: int, bnd: int = 0):
        return int(fl.count_cells(self.data, flag, bnd, self.dom))


def _wall_sdf(dom: Domain, bwidth: int, wall: str):
    """SDF of the boundary walls (positive inside the domain), matching
    InitMin/MaxXWall etc. (grid.cpp:760-796): distance to the inner face of
    each wall present in `wall`."""
    sz, sy, sx = dom.shape
    big = 1e9
    phi = jnp.full(dom.shape, big, dtype=jnp.float32)
    x = jnp.arange(sx, dtype=jnp.float32).reshape(1, 1, sx) + 0.5
    y = jnp.arange(sy, dtype=jnp.float32).reshape(1, sy, 1) + 0.5
    z = jnp.arange(sz, dtype=jnp.float32).reshape(sz, 1, 1) + 0.5
    w = bwidth + 1
    if "x" in wall:
        phi = jnp.minimum(phi, jnp.broadcast_to(x - w, dom.shape))
    if "X" in wall:
        phi = jnp.minimum(phi, jnp.broadcast_to(sx - w - x, dom.shape))
    if "y" in wall:
        phi = jnp.minimum(phi, jnp.broadcast_to(y - w, dom.shape))
    if "Y" in wall:
        phi = jnp.minimum(phi, jnp.broadcast_to(sy - w - y, dom.shape))
    if dom.is3d:
        if "z" in wall:
            phi = jnp.minimum(phi, jnp.broadcast_to(z - w, dom.shape))
        if "Z" in wall:
            phi = jnp.minimum(phi, jnp.broadcast_to(sz - w - z, dom.shape))
    return phi


# ---------------------------------------------------------------------------
# shapes (scene-facing wrappers around core.shapes)

class _SceneShape:
    core_cls = None

    def __init__(self, solver: "Solver" = None, **kw):
        self.solver = _resolve_parent(solver, kw.pop("parent", None))
        self.shape = self._make(**kw)

    def _make(self, **kw):
        raise NotImplementedError

    def applyToGrid(self, grid: GridBase, value=None, respectFlags=None):
        # stamped into the GRID's own index space (the shape is geometric;
        # a shape built on one solver can stamp another solver's grids)
        rf = respectFlags.data if respectFlags is not None else None
        if value is None:
            value = 1.0
        if isinstance(grid, MACGrid):
            grid.data = self.shape.apply_to_mac_grid(grid.data, value,
                                                     grid.dom, rf)
        else:
            grid.data = self.shape.apply_to_grid(grid.data, value,
                                                 grid.dom, rf)

    def applyToGridSmooth(self, grid: GridBase, sigma: float = 1.0,
                          shift: float = 0.0, value=1.0, respectFlags=None):
        rf = respectFlags.data if respectFlags is not None else None
        grid.data = self.shape.apply_to_grid_smooth(
            grid.data, value, grid.dom, sigma, shift, rf)

    def computeLevelset(self):
        g = LevelsetGrid(self.solver)
        g.data = self.shape.compute_levelset(self.solver.domain)
        return g

    def collideMesh(self, mesh):
        """Shape::collideMesh (shapes.cpp:106-131): push mesh nodes out of
        this shape to a 0.2-cell margin; sets NfCollide|NfMarked (mesh.h:135)
        on moved nodes in mesh.node_flags."""
        import numpy as np
        from ..core.mesh import collide_mesh_nodes
        dom = self.solver.domain
        phi = self.shape.compute_levelset(dom)
        new_nodes, hit = collide_mesh_nodes(mesh.nodes, phi, dom)
        mesh.nodes = np.asarray(new_nodes)
        nf = getattr(mesh, "node_flags", None)
        if nf is None or len(nf) != mesh.numNodes():
            nf = np.zeros(mesh.numNodes(), np.int32)
        NfMarked, NfCollide = 2, 8
        nf = np.where(np.asarray(hit), nf | (NfCollide | NfMarked),
                      nf & ~(NfCollide | NfMarked))
        mesh.node_flags = nf.astype(np.int32)


class Box(_SceneShape):
    def _make(self, p0=None, p1=None, center=None, size=None):
        return shp.Box(p0=p0, p1=p1, center=center, size=size,
                       dim=self.solver.domain.dim)


class Sphere(_SceneShape):
    def _make(self, center, radius, scale=vec3(1, 1, 1)):
        return shp.Sphere(center=center, radius=radius, scale=scale)


class Cylinder(_SceneShape):
    def _make(self, center, radius, z):
        return shp.Cylinder(center=center, radius=radius, z=z)


class Slope(_SceneShape):
    def _make(self, anglexy, angleyz, origin, gs):
        return shp.Slope(anglexy, angleyz, origin, gs)


class NullShape(_SceneShape):
    def _make(self):
        return shp.NullShape()


class NoiseField:
    """Scene wrapper for WaveletNoiseField with mantaflow attribute names."""

    def __init__(self, solver: "Solver" = None, fixedSeed: int = -1,
                 loadFromFile: bool = False, parent: "Solver" = None):
        solver = _resolve_parent(solver, parent)
        self.solver = solver
        self._n = WaveletNoiseField(solver.domain, fixedSeed, loadFromFile)

    def _set(self, name, value):
        object.__setattr__(self, name, value)

    # mantaflow-style attribute spelling
    posScale = property(lambda s: vec3(*s._n.pos_scale))
    posOffset = property(lambda s: vec3(*s._n.pos_offset))
    valScale = property(lambda s: s._n.val_scale)
    valOffset = property(lambda s: s._n.val_offset)
    clamp = property(lambda s: s._n.clamp)
    clampNeg = property(lambda s: s._n.clamp_neg)
    clampPos = property(lambda s: s._n.clamp_pos)
    timeAnim = property(lambda s: s._n.time_anim)

    def __setattr__(self, name, value):
        mapping = {
            "posScale": "pos_scale", "posOffset": "pos_offset",
            "valScale": "val_scale", "valOffset": "val_offset",
            "clamp": "clamp", "clampNeg": "clamp_neg",
            "clampPos": "clamp_pos", "timeAnim": "time_anim",
        }
        if name in mapping:
            if name in ("posScale", "posOffset"):
                if not isinstance(value, (tuple, list)):
                    value = (float(value),) * 3
                value = tuple(float(v) for v in value)
            setattr(self._n, mapping[name], value)
        else:
            object.__setattr__(self, name, value)


# ---------------------------------------------------------------------------
# solver

class Solver:
    """FluidSolver equivalent (scene-facing): grid-size/dt/frame state plus
    the create() factory (fluidsolver.h:26-119)."""

    def __init__(self, name: str = "solver", gridSize=(64, 64, 64),
                 dim: int = 3, fourthDim: int = -1):
        self.fourthDim = int(fourthDim)
        gs = tuple(int(v) for v in gridSize)
        if dim == 2:
            gs = (gs[0], gs[1], 1)
        self.name = name
        self.domain = Domain(size=gs, dim=dim)
        self.timestep = 1.0
        self.frameLength = 1.0
        self.cfl = 3.0
        self.timestepMin = 0.0001
        self.timestepMax = 1.0
        self._time_per_frame = 0.0
        self._lock_dt = False
        self.timeTotal = 0.0
        self.frame = 0
        self._count = 0

    # manta property names
    @property
    def dt(self):
        return self.timestep

    def getGridSize(self):
        return vec3(*self.domain.size)

    def is2D(self):
        return self.domain.dim == 2

    def is3D(self):
        return self.domain.dim == 3

    def create(self, cls, **kw):
        name = kw.pop("name", "")
        kw.pop("type", None)  # manta allows create(name=..., type=Cls)
        if issubclass(cls, GridBase):
            return cls(self, name=name)
        # shapes, noise fields, particle systems, meshes: ctor(solver, **kw)
        return cls(self, **kw)

    def step(self, frame: int = -1):
        """fluidsolver.cpp:143-166."""
        self._time_per_frame += self.timestep
        self.timeTotal += self.timestep
        self._count += 1
        if self._time_per_frame + slv.VECTOR_EPSILON > self.frameLength:
            self.frame += 1
            self.timeTotal = float(self.frame) * self.frameLength
            self._time_per_frame = 0.0
            self._lock_dt = False
        if frame >= 0:
            self.frame = frame

    def adaptTimestep(self, maxVel: float):
        """fluidsolver.cpp:184-204."""
        mvt = maxVel * self.timestep
        if not self._lock_dt:
            dt = max(min(self.timestep * (self.cfl / (mvt + 1e-5)),
                         self.timestepMax), self.timestepMin)
            if (self._time_per_frame + dt * 1.05) > self.frameLength:
                dt = (self.frameLength - self._time_per_frame) + 1e-4
            elif ((self._time_per_frame + dt + self.timestepMin)
                  > self.frameLength
                  or (self._time_per_frame + dt * 1.25) > self.frameLength):
                dt = (self.frameLength - self._time_per_frame + 1e-4) * 0.5
                self._lock_dt = True
            self.timestep = dt
        assert self.timestep > self.timestepMin / 2.0, "Invalid dt encountered!"

    def printMemInfo(self):
        pass


FluidSolver = Solver


from .timing_api import Timings  # noqa: E402  (real registry)


# ---------------------------------------------------------------------------
# jitted pure-op entry points (one compile per static config)

@partial(jax.jit, static_argnames=("order", "strength", "orderSpace",
                                   "clampMode", "orderTrace"))
def _advect_real_jit(flags, vel, grid, dt, order, strength, orderSpace,
                     clampMode, orderTrace):
    return adv.advect_real(flags, vel, grid, dt, order, strength, orderSpace,
                           clampMode, orderTrace)


@partial(jax.jit, static_argnames=("order", "strength", "orderSpace",
                                   "clampMode", "orderTrace"))
def _advect_mac_jit(flags, vel, grid, dt, order, strength, orderSpace,
                    clampMode, orderTrace):
    return adv.advect_mac(flags, vel, grid, dt, order, strength, orderSpace,
                          clampMode, orderTrace)


@partial(jax.jit, static_argnames=("order", "strength", "orderSpace",
                                   "clampMode", "orderTrace"))
def _advect_vec3_jit(flags, vel, grid, dt, order, strength, orderSpace,
                     clampMode, orderTrace):
    return adv.advect_vec3(flags, vel, grid, dt, order, strength, orderSpace,
                           clampMode, orderTrace)


@partial(jax.jit, static_argnames=("cgMaxIterFac", "cgAccuracy"))
def _cg_diffusion_jit(flags, grid, alpha, cgMaxIterFac, cgAccuracy):
    from ..core.domain import domain_from_shape
    dom = domain_from_shape(flags.shape)
    return prs.cg_solve_diffusion(flags, grid, dom, alpha, cgMaxIterFac,
                                  cgAccuracy)


def cgSolveDiffusion(flags: FlagGrid, grid: GridBase, alpha: float = 0.25,
                     cgMaxIterFac: float = 1.0, cgAccuracy: float = 1e-4):
    """conjugategrad.cpp:350 cgSolveDiffusion (viscosity; see
    lidDrivenCavity.py)."""
    grid.data = _cg_diffusion_jit(flags.data, grid.data,
                                  jnp.float32(alpha), float(cgMaxIterFac),
                                  float(cgAccuracy))


def advectSemiLagrange(flags: FlagGrid, vel: MACGrid, grid: GridBase,
                       order: int = 1, strength: float = 1.0,
                       orderSpace: int = 1, openBounds: bool = False,
                       boundaryWidth: int = -1, clampMode: int = 2,
                       orderTrace: int = 1):
    """plugin/advection.cpp:443 advectSemiLagrange."""
    del openBounds, boundaryWidth  # deprecated in the reference too
    dt = jnp.float32(grid.solver.timestep)
    if isinstance(grid, MACGrid):
        grid.data = _advect_mac_jit(flags.data, vel.data, grid.data, dt,
                                    order, strength, orderSpace, clampMode,
                                    orderTrace)
    elif isinstance(grid, (RealGrid, LevelsetGrid)):
        grid.data = _advect_real_jit(flags.data, vel.data, grid.data, dt,
                                     order, strength, orderSpace, clampMode,
                                     orderTrace)
    elif isinstance(grid, Vec3Grid):
        grid.data = _advect_vec3_jit(flags.data, vel.data, grid.data, dt,
                                     order, strength, orderSpace, clampMode,
                                     orderTrace)
    else:
        raise TypeError("advectSemiLagrange: unsupported grid type")


@partial(jax.jit, static_argnames=("cgAccuracy", "gfClamp", "cgMaxIterFac",
                                   "preconditioner", "enforceCompatibility",
                                   "useL2Norm", "zeroPressureFixing",
                                   "surfTens", "has_phi", "has_curv",
                                   "has_fractions", "has_obvel", "has_pcc"))
def _solve_pressure_jit(vel, flags, phi, perCellCorr, fractions, obvel, curv,
                        cgAccuracy, gfClamp, cgMaxIterFac, preconditioner,
                        enforceCompatibility, useL2Norm, zeroPressureFixing,
                        surfTens, has_phi, has_curv, has_fractions, has_obvel,
                        has_pcc):
    from ..core.domain import domain_from_shape
    dom = domain_from_shape(flags.shape)
    return prs.solve_pressure(
        vel, flags, dom, cgAccuracy,
        phi if has_phi else None,
        perCellCorr if has_pcc else None,
        fractions if has_fractions else None,
        obvel if has_obvel else None,
        gfClamp, cgMaxIterFac, preconditioner, enforceCompatibility,
        useL2Norm, zeroPressureFixing,
        curv if has_curv else None, surfTens)


def solvePressure(vel: MACGrid, pressure: RealGrid, flags: FlagGrid,
                  cgAccuracy: float = 1e-3, phi=None, perCellCorr=None,
                  fractions=None, obvel=None, gfClamp: float = 1e-4,
                  cgMaxIterFac: float = 1.5, precondition: bool = True,
                  preconditioner: int = PcMIC,
                  enforceCompatibility: bool = False, useL2Norm: bool = False,
                  zeroPressureFixing: bool = False, curv=None,
                  surfTens: float = 0.0, retRhs: RealGrid | None = None):
    """plugin/pressure.cpp:482 solvePressure."""
    if not precondition:
        preconditioner = PcNone
    z = jnp.zeros_like(pressure.data)
    zm = jnp.zeros_like(vel.data)
    new_vel, p, rhs, iters, rn = _solve_pressure_jit(
        vel.data, flags.data,
        phi.data if phi is not None else z,
        perCellCorr.data if perCellCorr is not None else z,
        fractions.data if fractions is not None else zm,
        obvel.data if obvel is not None else zm,
        curv.data if curv is not None else z,
        cgAccuracy, gfClamp, cgMaxIterFac, preconditioner,
        enforceCompatibility, useL2Norm, zeroPressureFixing, surfTens,
        phi is not None, curv is not None, fractions is not None,
        obvel is not None, perCellCorr is not None)
    vel.data = new_vel
    pressure.data = p
    if retRhs is not None:
        retRhs.data = rhs
    mantaMsg(f"FluidSolver::solvePressure done. Iterations:{int(iters)}, "
             f"residual:{float(rn):g}", 2)


def setWallBcs(flags: FlagGrid, vel: MACGrid, obvel=None, fractions=None,
               phiObs=None, boundaryWidth: int = 0):
    """setWallBcs (extforces.cpp:327-335): plain axis-aligned kernel, or the
    second-order fraction variant when both fractions and phiObs are given."""
    ob = obvel.data if obvel is not None else None
    if fractions is not None and phiObs is not None:
        vel.data = ext.set_wall_bcs_frac(flags.data, vel.data, flags.dom,
                                         phiObs.data, ob)
    else:
        vel.data = ext.set_wall_bcs(flags.data, vel.data, flags.dom, ob)


def addGravity(flags: FlagGrid, vel: MACGrid, gravity, exclude=None,
               scale: bool = True):
    vel.data = ext.add_gravity(flags.data, vel.data, tuple(gravity),
                               flags.solver.timestep, flags.dom,
                               exclude.data if exclude is not None else None,
                               scale)


def addGravityNoScale(flags: FlagGrid, vel: MACGrid, gravity, exclude=None):
    addGravity(flags, vel, gravity, exclude, scale=False)


def addBuoyancy(flags: FlagGrid, density: RealGrid, vel: MACGrid, gravity,
                coefficient: float = 1.0, scale: bool = True):
    vel.data = ext.add_buoyancy(flags.data, density.data, vel.data,
                                tuple(gravity), flags.solver.timestep,
                                flags.dom, coefficient, scale)


def setOpenBound(flags: FlagGrid, bWidth: int, openBound: str = "",
                 type: int = fl.TypeOutflow | fl.TypeEmpty):
    flags.data = fl.set_open_bound(flags.data, flags.dom, bWidth, openBound,
                                   type)


def resetOutflow(flags: FlagGrid, phi=None, parts=None, real=None, index=None,
                 indexSys=None):
    new_flags, new_phi, new_real = ext.reset_outflow_grids(
        flags.data, flags.dom,
        phi.data if phi is not None else None,
        real.data if real is not None else None)
    flags.data = new_flags
    if phi is not None:
        phi.data = new_phi
    if real is not None:
        real.data = new_real
    if parts is not None:
        parts.kill_in_outflow(flags)


def vorticityConfinement(vel: MACGrid, flags: FlagGrid, strength: float = 0.0,
                         strengthCell=None):
    sc = strengthCell.data if strengthCell is not None else None
    vel.data = ext.vorticity_confinement(vel.data, flags.data, flags.dom,
                                         strength, sc)


def addForceField(flags: FlagGrid, vel: MACGrid, force: Vec3Grid, region=None,
                  isMAC: bool = False):
    vel.data = ext.apply_force_field(
        flags.data, vel.data, force.data, flags.dom,
        region.data if region is not None else None, True, isMAC)


def setForceField(flags: FlagGrid, vel: MACGrid, force: Vec3Grid, region=None,
                  isMAC: bool = False):
    vel.data = ext.apply_force_field(
        flags.data, vel.data, force.data, flags.dom,
        region.data if region is not None else None, False, isMAC)


def setInitialVelocity(flags: FlagGrid, vel: MACGrid, invel: Vec3Grid):
    vel.data = ext.set_initial_velocity(flags.data, vel.data, invel.data,
                                        flags.dom)


def setInflowBcs(vel: MACGrid, dir: str, value):
    vel.data = ext.set_inflow_bcs(vel.data, vel.dom, dir, tuple(value))


def dissolveSmoke(flags: FlagGrid, density: RealGrid, heat=None, red=None,
                  green=None, blue=None, speed: int = 5,
                  logFalloff: bool = True):
    d, h = ext.dissolve_smoke(flags.data, density.data, flags.dom,
                              heat.data if heat is not None else None,
                              speed, logFalloff)
    density.data = d
    if heat is not None:
        heat.data = h


def densityInflow(flags: FlagGrid, density: RealGrid, noise: NoiseField,
                  shape, scale: float = 1.0, sigma: float = 0.0):
    t = flags.solver.timeTotal * flags.dom.dx
    density.data = ini.density_inflow(flags.data, density.data, noise._n,
                                      shape.shape, flags.dom, scale, sigma,
                                      time=t)


def addNoise(flags: FlagGrid, density: RealGrid, noise: NoiseField, sdf=None,
             scale: float = 1.0):
    t = flags.solver.timeTotal * flags.dom.dx
    density.data = ini.add_noise(flags.data, density.data, noise._n,
                                 flags.dom,
                                 sdf.data if sdf is not None else None,
                                 scale, time=t)


def applyEmission(flags: FlagGrid, target: RealGrid, source: RealGrid,
                  emissionTexture=None, isAbsolute: bool = True):
    target.data = ini.apply_emission(
        flags.data, target.data, source.data, flags.dom,
        emissionTexture.data if emissionTexture is not None else None,
        isAbsolute)


def blurRealGrid(source: RealGrid, target: RealGrid, sigma: float = 1.0):
    target.data = ini.blur_real_grid(source.data, source.dom, sigma)


def blurMacGrid(source: MACGrid, target: MACGrid, sigma: float = 1.0):
    target.data = ini.blur_mac_grid(source.data, source.dom, sigma)


def checkSymmetry(a: RealGrid, err=None, symmetrize: bool = False,
                  axis: int = 0, bound: int = 0):
    """checkSymmetry (initplugins.cpp:189)."""
    new_a, new_err = ini.check_symmetry(
        a.data, a.dom, err.data if err is not None else None, symmetrize,
        axis, bound)
    a.data = new_a
    if err is not None:
        err.data = new_err


def checkSymmetryVec3(a, err=None, symmetrize: bool = False, axis: int = 0,
                      bound: int = 0, disable: int = 0):
    """checkSymmetryVec3 (initplugins.cpp:205)."""
    new_a, new_err = ini.check_symmetry_vec3(
        a.data, a.dom, err.data if err is not None else None, symmetrize,
        axis, bound, disable)
    a.data = new_a
    if err is not None:
        err.data = new_err


def testInitGridWithPos(grid: RealGrid):
    """testInitGridWithPos (flip.cpp:191): grid(i,j,k) = |Vec3(i,j,k)|."""
    sz, sy, sx = grid.dom.shape
    x = jnp.arange(sx, dtype=jnp.float32).reshape(1, 1, sx)
    y = jnp.arange(sy, dtype=jnp.float32).reshape(1, sy, 1)
    z = jnp.arange(sz, dtype=jnp.float32).reshape(sz, 1, 1)
    grid.data = jnp.sqrt(x * x + y * y + z * z)


testInitGridWithPos.__test__ = False  # keep pytest from collecting it


def getGridAvg(source: RealGrid, flags=None):
    if flags is not None:
        m = fl.is_fluid(flags.data)
        s = jnp.sum(jnp.where(m, source.data, 0.0))
        c = jnp.maximum(jnp.sum(m.astype(jnp.float32)), 1.0)
        return float(s / c)
    return float(jnp.mean(source.data))


def gridMaxDiff(g1: GridBase, g2: GridBase):
    """Max abs per-cell difference (grid.cpp:437), the golden-test metric."""
    return float(jnp.max(jnp.abs(g1.data.astype(jnp.float32)
                                 - g2.data.astype(jnp.float32))))


def gridMaxDiffInt(g1, g2):
    return gridMaxDiff(g1, g2)


def gridMaxDiffVec3(g1, g2):
    return gridMaxDiff(g1, g2)


def copyMacToVec3(source: MACGrid, target: Vec3Grid):
    target.data = source.data


def copyVec3ToReal(source: Vec3Grid, targetX: RealGrid, targetY: RealGrid,
                   targetZ: RealGrid):
    targetX.data, targetY.data, targetZ.data = (source.data[0],
                                                source.data[1],
                                                source.data[2])


def copyRealToVec3(sourceX: RealGrid, sourceY: RealGrid, sourceZ: RealGrid,
                   target: Vec3Grid):
    target.data = jnp.stack([sourceX.data, sourceY.data, sourceZ.data])


def copyLevelsetToReal(source: LevelsetGrid, target: RealGrid):
    target.data = source.data


def getComponent(source: Vec3Grid, target: RealGrid, component: int):
    target.data = source.data[component]


def setComponent(source: RealGrid, target: Vec3Grid, component: int):
    target.data = target.data.at[component].set(source.data)


class Grid4Base:
    """4D space-time grid (grid4d.h:27-93), array layout [t,z,y,x]."""
    dtype = jnp.float32
    channels = 0

    def __init__(self, solver: "Solver" = None, name: str = "",
                 parent: "Solver" = None):
        from ..core import grid4d as g4
        solver = _resolve_parent(solver, parent)
        self.solver = solver
        self.name = name
        st = max(solver.fourthDim, 1)
        sx, sy, sz = solver.domain.size
        self.data = g4.zeros4d((sx, sy, sz, st), self.dtype,
                               self.channels)

    def _const(self, v):
        """Scalar or per-channel (vec3/vec4) constant, broadcastable."""
        if self.channels and hasattr(v, "__len__"):
            return jnp.asarray(tuple(v)[:self.channels],
                               self.dtype).reshape(self.channels, 1, 1, 1, 1)
        return jnp.asarray(v, self.dtype)

    def setConst(self, v):
        self.data = jnp.broadcast_to(self._const(v),
                                     self.data.shape).astype(self.dtype)

    def clear(self):
        self.data = jnp.zeros_like(self.data)

    def add(self, other):
        self.data = self.data + other.data

    def sub(self, other):
        self.data = self.data - other.data

    def addConst(self, v):
        self.data = self.data + self._const(v)

    def addScaled(self, other, factor):
        self.data = self.data + self._const(factor) * other.data

    def multConst(self, v):
        self.data = self.data * self._const(v)

    def copyFrom(self, other):
        self.data = other.data.astype(self.dtype)

    def getMaxAbs(self):
        return float(jnp.max(jnp.abs(self.data)))

    def getInterpolated(self, pos4):
        from ..core import grid4d as g4
        args = tuple(jnp.float32(pos4[c]) for c in range(4))
        if self.channels:
            return tuple(float(g4.interpol4d(self.data[c], *args))
                         for c in range(self.channels))
        return float(g4.interpol4d(self.data, *args))

    def to_numpy(self):
        return np.asarray(self.data)

    def from_numpy(self, arr):
        self.data = jnp.asarray(arr, self.dtype).reshape(self.data.shape)

    def _bnd_mask(self, w: int):
        st, sz, sy, sx = self.data.shape[-4:]
        i = jnp.arange(sx).reshape(1, 1, 1, sx)
        j = jnp.arange(sy).reshape(1, 1, sy, 1)
        k = jnp.arange(sz).reshape(1, sz, 1, 1)
        t = jnp.arange(st).reshape(st, 1, 1, 1)
        return ((i <= w) | (i >= sx - 1 - w) | (j <= w) | (j >= sy - 1 - w)
                | (k <= w) | (k >= sz - 1 - w) | (t <= w) | (t >= st - 1 - w))

    def setBound(self, value, boundaryWidth: int = 0):
        """knSetBnd4d (grid4d.cpp:299): constant on the 4D boundary shell."""
        m = self._bnd_mask(boundaryWidth)
        if self.channels:
            v = jnp.asarray(tuple(value), self.dtype)
            self.data = jnp.where(m[None], v.reshape(-1, 1, 1, 1, 1),
                                  self.data)
        else:
            self.data = jnp.where(m, jnp.asarray(value, self.dtype),
                                  self.data)

    def setBoundNeumann(self, boundaryWidth: int = 0):
        """knSetBnd4dNeumann (grid4d.cpp:313): copy the nearest interior
        value onto the boundary shell (per-axis clamped source index)."""
        st, sz, sy, sx = self.data.shape[-4:]
        w = boundaryWidth

        def src_idx(n):
            r = jnp.arange(n)
            return jnp.clip(r, w + 1, n - 2 - w)

        d = jnp.take(self.data, src_idx(sx), axis=-1)
        d = jnp.take(d, src_idx(sy), axis=-2)
        d = jnp.take(d, src_idx(sz), axis=-3)
        d = jnp.take(d, src_idx(st), axis=-4)
        m = self._bnd_mask(w)
        if self.channels:
            m = m[None]
        self.data = jnp.where(m, d, self.data)


class Grid4Real(Grid4Base):
    pass


class Grid4Int(Grid4Base):
    dtype = jnp.int32


class Grid4Vec3(Grid4Base):
    channels = 3


class Grid4Vec4(Grid4Base):
    channels = 4


def getSliceFrom4d(src: Grid4Real, srct: int, dst):
    """getSliceFrom4d (grid4d.cpp): copy time slice srct into a 3D grid."""
    dst.data = src.data[srct] if src.channels == 0 else src.data[:, srct]


def setSliceTo4d(src, dst: Grid4Real, dstt: int):
    if dst.channels == 0:
        dst.data = dst.data.at[dstt].set(src.data)
    else:
        dst.data = dst.data.at[:, dstt].set(src.data)


def getComp4d(src: Grid4Vec4, dst: Grid4Real, c: int):
    """getComp4d (grid4d.cpp:295): extract one component of a Vec4 grid."""
    dst.data = src.data[c]


def setComp4d(src: Grid4Real, dst: Grid4Vec4, c: int):
    """setComp4d (grid4d.cpp:296)."""
    dst.data = dst.data.at[c].set(src.data)


def grid4dMaxDiff(g1: Grid4Real, g2: Grid4Real) -> float:
    """grid4dMaxDiff (grid4d.cpp:352): max per-cell |difference|."""
    return float(jnp.max(jnp.abs(g1.data.astype(jnp.float32)
                                 - g2.data.astype(jnp.float32))))


def grid4dMaxDiffInt(g1: Grid4Int, g2: Grid4Int) -> float:
    return grid4dMaxDiff(g1, g2)


def grid4dMaxDiffVec3(g1: Grid4Vec3, g2: Grid4Vec3) -> float:
    """grid4dMaxDiffVec3 (grid4d.cpp:368): max over cells of the SUM of
    per-component |differences| (reference sums components per cell)."""
    d = jnp.abs(g1.data.astype(jnp.float32) - g2.data.astype(jnp.float32))
    return float(jnp.max(jnp.sum(d, axis=0)))


def grid4dMaxDiffVec4(g1: Grid4Vec4, g2: Grid4Vec4) -> float:
    return grid4dMaxDiffVec3(g1, g2)


def _region4d_mask(shape4, start, end):
    st, sz, sy, sx = shape4
    i = jnp.arange(sx).reshape(1, 1, 1, sx)
    j = jnp.arange(sy).reshape(1, 1, sy, 1)
    k = jnp.arange(sz).reshape(1, sz, 1, 1)
    t = jnp.arange(st).reshape(st, 1, 1, 1)
    return ((i >= start[0]) & (i <= end[0]) & (j >= start[1])
            & (j <= end[1]) & (k >= start[2]) & (k <= end[2])
            & (t >= start[3]) & (t <= end[3]))


def setRegion4d(dst: Grid4Real, start, end, value: float):
    """setRegion4d (grid4d.cpp:402): constant fill of an ijkt box."""
    m = _region4d_mask(dst.data.shape[-4:], tuple(start), tuple(end))
    dst.data = jnp.where(m, jnp.asarray(value, dst.dtype), dst.data)


def setRegion4dVec4(dst: Grid4Vec4, start, end, value):
    m = _region4d_mask(dst.data.shape[-4:], tuple(start), tuple(end))
    v = jnp.asarray(tuple(value), dst.dtype).reshape(-1, 1, 1, 1, 1)
    dst.data = jnp.where(m[None], v, dst.data)


def getSliceFrom4dVec(src: Grid4Vec4, srct: int, dst, dstt=None):
    """getSliceFrom4dVec (grid4d.cpp:420): xyz components of time slice srct
    into a Vec3 grid, optionally the t component into a Real grid."""
    dst.data = src.data[:3, srct]
    if dstt is not None:
        dstt.data = src.data[3, srct]


def interpolateGrid4d(target: Grid4Base, source: Grid4Base,
                      offset=(0, 0, 0, 0), scale=(1, 1, 1, 1),
                      size=(-1, -1, -1, -1)):
    """interpolateGrid4d(+Vec) (grid4d.cpp:455-468): resample a 4D grid;
    pos = ijkt*srcFac - offset*srcFac + srcFac/2, srcFac from the size
    ratio (overridable via `size`) divided by `scale`."""
    from ..core import grid4d as g4
    st, sz, sy, sx = target.data.shape[-4:]
    ss = source.data.shape[-4:]  # (T,Z,Y,X)
    tgt = [sx, sy, sz, st]
    eff = [size[c] if size[c] > 0 else tgt[c] for c in range(4)]
    f = [ss[3 - c] / eff[c] / scale[c] for c in range(4)]
    off2 = [-offset[c] * f[c] + f[c] * 0.5 for c in range(4)]
    xs = jnp.arange(sx, dtype=jnp.float32).reshape(1, 1, 1, sx) * f[0] + off2[0]
    ys = jnp.arange(sy, dtype=jnp.float32).reshape(1, 1, sy, 1) * f[1] + off2[1]
    zs = jnp.arange(sz, dtype=jnp.float32).reshape(1, sz, 1, 1) * f[2] + off2[2]
    ts = jnp.arange(st, dtype=jnp.float32).reshape(st, 1, 1, 1) * f[3] + off2[3]
    shape = (st, sz, sy, sx)
    px = jnp.broadcast_to(xs, shape)
    py = jnp.broadcast_to(ys, shape)
    pz = jnp.broadcast_to(zs, shape)
    pt = jnp.broadcast_to(ts, shape)
    if target.channels:
        target.data = jnp.stack([
            g4.interpol4d(source.data[c], px, py, pz, pt)
            for c in range(target.channels)])
    else:
        target.data = g4.interpol4d(source.data, px, py, pz, pt)


def interpolateGrid4dVec(target: Grid4Vec4, source: Grid4Vec4,
                         offset=(0, 0, 0, 0), scale=(1, 1, 1, 1),
                         size=(-1, -1, -1, -1)):
    interpolateGrid4d(target, source, offset, scale, size)


def printBuildInfo():
    mantaMsg("mantaflow-tpu: JAX/XLA/Pallas build, platform="
             + jax.default_backend())


def assertNumpy():
    pass
