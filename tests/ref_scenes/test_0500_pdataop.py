"""Particle-data channel arithmetic vs reference-binary goldens.

Compact port of tools/tests/test_0500_pdataop.py: loads the golden particle
system (10 test particles), runs the Real/Vec3/int pdata op chains, and
compares each channel with the reference's thresholds.
"""
import os
from mantaflow_tpu import *

_REF = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "testdata_ref")


def scene(dtg):
    s = Solver(name='main', gridSize=vec3(12, 19, 31), dim=3)
    pp = s.create(BasicParticleSystem)
    rlg = [pp.create(PdataReal) for _ in range(3)]
    vcg = [pp.create(PdataVec3) for _ in range(3)]
    ints = [pp.create(PdataInt) for _ in range(3)]

    pp.load(os.path.join(_REF, "test_0500_pdataop_parts.uni"))

    rlg[0].setConst(1.0); rlg[0].addConst(0.1)
    rlg[1].setConst(2.4); rlg[1].multConst(0.5)
    rlg[2].setConst(9.6); rlg[2].copyFrom(rlg[0])
    rlg[2].add(rlg[1]); rlg[2].addScaled(rlg[1], 0.5)

    vcg[0].setConst(vec3(1, 1, 1)); vcg[0].addConst(vec3(0.2, 0.2, 0.2))
    vcg[1].setConst(vec3(1, 1, 1)); vcg[1].multConst(vec3(0.5, 0.5, 0.5))
    vcg[2].setConst(vec3(9, 9, 9)); vcg[2].copyFrom(vcg[0])
    vcg[2].add(vcg[1]); vcg[2].addScaled(vcg[1], vec3(0.5, 0.5, 0.5))

    ints[0].setConst(123); ints[0].addConst(2)
    ints[1].setConst(2); ints[1].multConst(3)
    ints[2].setConst(9); ints[2].copyFrom(ints[0])
    ints[2].add(ints[1]); ints[2].addScaled(ints[1], 2)

    for i in range(3):
        dtg(f"rlg{i+1}", rlg[i], 1e-07)
        dtg(f"vcg{i+1}", vcg[i], 5e-07)
        dtg(f"int{i+1}", ints[i], 1e-14)
