"""4D grid interpolation chains vs reference-binary goldens.

Compact port of tools/tests/test_0042_interpol4d.py: region-stamped
Real/Vec4 4D grids resampled small->mid->XL->mid->small through
interpolateGrid4d / interpolateGrid4dVec (linear only in 4D).
"""
from mantaflow_tpu import *


def scene(dtg):
    upres, res = 2, 40
    smgs = vec3(res // upres, res // upres, res // upres)
    gs = vec3(res, res, res)
    xlgs = vec3(res * upres, res * upres, res * upres)
    smS = Solver(name='small', gridSize=smgs, dim=3, fourthDim=int(smgs.x))
    nmS = Solver(name='mid', gridSize=gs, dim=3, fourthDim=int(gs.x))
    xlS = Solver(name='xl', gridSize=xlgs, dim=3, fourthDim=int(xlgs.x))

    sm_d, d, xl_d, d2, sm_d2 = (smS.create(Grid4Real), nmS.create(Grid4Real),
                                xlS.create(Grid4Real), nmS.create(Grid4Real),
                                smS.create(Grid4Real))
    sm_v, v, xl_v, v2, sm_v2 = (smS.create(Grid4Vec4), nmS.create(Grid4Vec4),
                                xlS.create(Grid4Vec4), nmS.create(Grid4Vec4),
                                smS.create(Grid4Vec4))

    rs, re = smgs.x * 0.3, smgs.x * 0.7
    rstart = Vec4(rs, rs, rs, rs)
    rend = Vec4(re, re, re, re)

    setRegion4d(sm_d, start=rstart, end=rend, value=1)
    setRegion4dVec4(sm_v, start=rstart, end=rend, value=Vec4(1, 1, 1, 1))

    interpolateGrid4d(target=d, source=sm_d)
    interpolateGrid4d(target=xl_d, source=d)
    interpolateGrid4d(target=d2, source=xl_d)
    interpolateGrid4d(target=sm_d2, source=d2)

    interpolateGrid4dVec(target=v, source=sm_v)
    interpolateGrid4dVec(target=xl_v, source=v)
    interpolateGrid4dVec(target=v2, source=xl_v)
    interpolateGrid4dVec(target=sm_v2, source=v2)

    dtg("scalar1", d, 1e-05)
    dtg("scalar2", sm_d, 1e-05)
    dtg("scalar3", sm_d2, 1e-05)
    dtg("vec3t1", v, 1e-05)
    dtg("vec3t2", sm_v, 1e-05)
    dtg("vec3t3", sm_v2, 1e-05)
