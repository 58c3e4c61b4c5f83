"""Grid arithmetic ops vs reference-binary goldens.

Compact port of the reference test tools/tests/test_0030_gridop.py: the
same op sequences (addConst/multConst/copyFrom/add/addScaled on Real, MAC
and int grids) on a 10x20x30 solver, checked against goldens the reference
binary generated.
"""
from mantaflow_tpu import *


def scene(dtg):
    s = Solver(name='main', gridSize=vec3(10, 20, 30), dim=3)
    rlg = [s.create(RealGrid) for _ in range(3)]
    vcg = [s.create(MACGrid) for _ in range(3)]
    ints = [s.create(IntGrid) for _ in range(3)]
    tmp = s.create(MACGrid)

    rlg[0].setConst(1.0); rlg[0].addConst(0.1)
    rlg[1].setConst(2.4); rlg[1].multConst(0.5)
    rlg[2].setConst(9.6); rlg[2].copyFrom(rlg[0])
    rlg[2].add(rlg[1]); rlg[2].addScaled(rlg[1], 0.5)

    vcg[0].setConst(vec3(1, 1, 1)); vcg[0].addConst(vec3(0.25, 0.25, 0.25))
    vcg[1].setConst(vec3(1, 1, 1)); vcg[1].multConst(vec3(0.5, 0.5, 0.5))
    vcg[2].setConst(vec3(9, 9, 9))
    tmp.setConst(vec3(1.2, 1.2, 1.2))
    vcg[2].copyFrom(tmp); vcg[2].add(vcg[1])
    vcg[2].addScaled(vcg[1], vec3(0.5, 0.5, 0.5))

    ints[0].setConst(123); ints[0].addConst(2)
    ints[1].setConst(2); ints[1].multConst(3)
    ints[2].setConst(9); ints[2].copyFrom(ints[0])
    ints[2].add(ints[1]); ints[2].addScaled(ints[1], 2)

    for i in range(3):
        dtg(f"rlg{i+1}", rlg[i], 1e-07)
        dtg(f"vcg{i+1}", vcg[i], 5e-07)
        dtg(f"int{i+1}", ints[i], 1e-14)
