"""Particle system + pdata IO roundtrip vs reference-binary goldens.

Compact port of tools/tests/test_2065_partIo.py (load-side): restore the
golden particle system and its Real channel from .uni, map the channel to a
grid, and compare against the reference's mapped-density golden.
"""
import os
from mantaflow_tpu import *

_REF = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "testdata_ref")


def scene(dtg):
    res = 50
    s = Solver(name='main', gridSize=vec3(res, res, res), dim=3)
    s.timestep = 0.58
    flags = s.create(FlagGrid)
    density = s.create(RealGrid)
    pp = s.create(BasicParticleSystem)
    pVel = pp.create(PdataVec3)
    pDens = pp.create(PdataReal)
    del pVel
    flags.initDomain(boundaryWidth=0)
    flags.fillGrid()

    pp.load(os.path.join(_REF, "test_2065_partIo_parts.uni"))
    pDens.load(os.path.join(_REF, "test_2065_partIo_pDens.uni"))
    mapPartsToGrid(target=density, flags=flags, parts=pp, source=pDens)
    s.step()
    dtg("dens", density, 1e-05)
