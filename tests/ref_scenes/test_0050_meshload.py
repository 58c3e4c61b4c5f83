"""Mesh load + mesh->SDF vs the reference-binary golden.

Compact port of tools/tests/test_0050_meshload.py: load the torus obj
(quads collapse to their first three vertices — reference reader quirk),
scale/offset into a 100^3 grid, run meshSDF (sigma=2, cutoff=2*sigma) and
compare the levelset.
"""
import os
from mantaflow_tpu import *

_REF = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "testdata_ref")


def scene(dtg):
    res = 100
    gs = vec3(res, res, res)
    s = Solver(name='main', gridSize=gs, dim=3)

    flags = s.create(FlagGrid)
    phi = s.create(LevelsetGrid)
    mesh = s.create(Mesh)
    flags.initDomain(boundaryWidth=0)

    mesh.load(os.path.join(_REF, "test_0050_meshload.obj"))
    mesh.scale(vec3(res / 3.0))
    mesh.offset(gs * 0.5)
    mesh.computeLevelset(phi, 2., -1.)
    s.step()

    dtg("phi", phi, 1e-05)
