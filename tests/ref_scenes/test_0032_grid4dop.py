"""4D grid operator chains vs reference-binary goldens.

Compact port of tools/tests/test_0032_grid4dop.py: Real/Vec3/Int/Vec4 4D
grid arithmetic (setConst/addConst/multConst/copyFrom/add/addScaled) on a
10x20x30 (t=12) space-time solver.
"""
from mantaflow_tpu import *


def scene(dtg):
    gs = vec3(10, 20, 30)
    s = Solver(name='main', gridSize=gs, dim=3, fourthDim=12)

    rlg = [s.create(Grid4Real) for _ in range(3)]
    vcg = [s.create(Grid4Vec3) for _ in range(3)]
    ints = [s.create(Grid4Int) for _ in range(3)]
    fdg = [s.create(Grid4Vec4) for _ in range(3)]

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

    fdg[0].setConst(vec4(1, 1, 1, 1)); fdg[0].addConst(vec4(.2, .2, .2, .2))
    fdg[1].setConst(vec4(1, 1, 1, 1)); fdg[1].multConst(vec4(.5, .5, .5, .5))
    fdg[2].setConst(vec4(9, 9, 9, 9)); fdg[2].copyFrom(fdg[0])
    fdg[2].add(fdg[1]); fdg[2].addScaled(fdg[1], vec4(0.5, 0.5, 0.5, 0.5))

    for i in range(3):
        dtg(f"rlg{i+1}", rlg[i], 1e-07)
    for i in range(3):
        dtg(f"vcg{i+1}", vcg[i], 5e-07)
    for i in range(3):
        dtg(f"int{i+1}", ints[i], 1e-14)
    for i in range(3):
        dtg(f"fdg{i+1}", fdg[i], 5e-07)
