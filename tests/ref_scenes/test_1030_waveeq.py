"""2D wave equation (explicit then implicit CG) vs reference-binary goldens.

Compact port of tools/tests/test_1030_waveeq.py: 113x127 grid, 40 steps —
explicit second-derivative integration for the first half, cgSolveWE for
the second, with mass normalization each step. The CG stops on the fork's
GridSumSqr metric (conjugategrad.h:31 defaults mUseL2Norm=true), so both
sides stop at the same point; residual path noise leaves ~2e-5.
"""
from mantaflow_tpu import *


def scene(dtg):
    gs = vec3(113, 127, 1)
    s = Solver(name='main', gridSize=gs, dim=2)
    s.timestep = 0.9
    c_sqr = 0.12
    h = s.create(RealGrid)
    hprev = s.create(RealGrid)
    hnew = s.create(RealGrid)
    curv = s.create(RealGrid)
    vel = s.create(RealGrid)
    flags = s.create(FlagGrid)
    flags.initDomain()
    flags.fillGrid()
    source = s.create(Box, p0=gs * vec3(0.3, 0.3, 0.3),
                      p1=gs * vec3(0.5, 0.5, 0.5))
    source.applyToGrid(grid=h, value=1)
    hprev.copyFrom(h)

    implicit = False
    for t in range(40):
        mass = totalSum(height=h)
        if implicit:
            cgSolveWE(flags=flags, ut=h, utm1=hprev, out=hnew, cSqr=c_sqr,
                      crankNic=False)
        else:
            calcSecDeriv2d(h, curv)
            vel.addScaled(curv, c_sqr * s.timestep)
            h.addScaled(vel, s.timestep)
            if t >= 20:
                implicit = True
        normalizeSumTo(h, mass)
        s.step()

    dtg("height", h, 1e-04)
    dtg("vel", vel, 1e-04)
