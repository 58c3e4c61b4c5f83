"""Scene-level Mesh object and mesh plugins (mesh.h:129-420,
levelset.cpp:330 createMesh, plugin/meshplugins.cpp)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import mesh as cmesh
from ..io import uni as uio
from .api import FlagGrid, LevelsetGrid, MACGrid, RealGrid, Solver, mantaMsg


class Mesh:
    """Triangle mesh (nodes/tris); node data channels as numpy arrays."""

    def __init__(self, solver: Solver, name: str = ""):
        self.solver = solver
        self.name = name
        self.nodes = np.zeros((0, 3), np.float32)
        self.tris = np.zeros((0, 3), np.int32)

    @property
    def dom(self):
        return self.solver.domain

    def numNodes(self):
        return self.nodes.shape[0]

    def numTris(self):
        return self.tris.shape[0]

    def clear(self):
        self.nodes = np.zeros((0, 3), np.float32)
        self.tris = np.zeros((0, 3), np.int32)

    def load(self, name: str, append: bool = False):
        if name.endswith(".obj"):
            nodes, tris = uio.read_mesh_obj(name)
        elif name.endswith(".bobj.gz") or name.endswith(".bobj"):
            nodes, tris = uio.read_mesh_bobj(name)
        else:
            raise ValueError(f"mesh load: unknown extension {name}")
        if append and self.numNodes():
            tris = tris + self.numNodes()
            self.nodes = np.concatenate([self.nodes, nodes])
            self.tris = np.concatenate([self.tris, tris])
        else:
            self.nodes, self.tris = nodes, tris

    def save(self, name: str):
        if name.endswith(".obj"):
            uio.write_mesh_obj(name, self.nodes, self.tris)
        elif name.endswith(".bobj.gz") or name.endswith(".bobj"):
            uio.write_mesh_bobj(name, self.nodes, self.tris)
        else:
            raise ValueError(f"mesh save: unknown extension {name}")

    def advectInGrid(self, flags: FlagGrid, vel: MACGrid,
                     integrationMode: int = 1):
        new = cmesh.advect_mesh_nodes(self.nodes, vel.data,
                                      self.solver.timestep, self.dom,
                                      integrationMode)
        self.nodes = np.asarray(new)

    def computeLevelset(self, levelset: LevelsetGrid, sigma: float = 2.0,
                        cutoff: float = -1.0):
        levelset.data = cmesh.mesh_to_levelset(self.nodes, self.tris,
                                               self.dom)

    def applyMeshToGrid(self, grid, value=1.0, cutoff: float = -1.0,
                        meshSigma: float = 2.0):
        phi = cmesh.mesh_to_levelset(self.nodes, self.tris, self.dom)
        grid.data = jnp.where(phi < 0.0, value, grid.data)

    def scale(self, s):
        self.nodes = self.nodes * np.asarray(s, np.float32)

    def offset(self, o):
        self.nodes = self.nodes + np.asarray(o, np.float32)

    def fromShape(self, shape):
        """Build from a shape's SDF via surface extraction."""
        phi = np.asarray(shape.shape.compute_levelset(self.dom))
        self.nodes, self.tris = cmesh.marching_tets(phi)


def _ls_create_mesh(self: LevelsetGrid, mesh: Mesh):
    """LevelsetGrid::createMesh (levelset.cpp:330): extract phi=0 surface.
    Uses marching tetrahedra (see core/mesh.py module doc)."""
    nodes, tris = cmesh.marching_tets(np.asarray(self.data))
    mesh.nodes, mesh.tris = nodes, tris


LevelsetGrid.createMesh = _ls_create_mesh


def smoothMesh(mesh: Mesh, strength: float = 1.0, steps: int = 1,
               minLength: float = 1e-5):
    mesh.nodes = cmesh.smooth_mesh(mesh.nodes, mesh.tris, strength, steps)


def subdivideMesh(mesh: Mesh, minAngle: float = 0.0, minLength: float = 0.0,
                  maxLength: float = 2.0, cutTubes: bool = False):
    """subdivideMesh (meshplugins.cpp:108): collapse short/sliver edges,
    then split edges longer than maxLength (reference sweep order)."""
    nodes, tris = cmesh.collapse_edges(mesh.nodes, mesh.tris, minLength,
                                       minAngle)
    mesh.nodes, mesh.tris = cmesh.subdivide_mesh(nodes, tris, maxLength)


def killSmallComponents(mesh: Mesh, elements: int = 10):
    mesh.nodes, mesh.tris = cmesh.kill_small_components(mesh.nodes, mesh.tris,
                                                        elements)
