"""2D grid interpolation chains (linear + cubic) vs reference-binary
goldens. Compact port of tools/tests/test_0040_interpol2d.py: cylinder-
stamped scalar/Vec3/MAC grids resampled small->mid->XL->mid->small through
interpolateGrid / interpolateGridVec3 / interpolateMACGrid at orderSpace
1 and 2.
"""
from mantaflow_tpu import *


def _run_chain(dtg, dim, ords, tag, thr):
    upres, res = 5, 60
    smgs = vec3(res // upres, res // upres, 1 if dim == 2 else res // upres)
    gs = vec3(res, res, 1 if dim == 2 else res)
    xl_gs = vec3(res * upres, res * upres, 1 if dim == 2 else res * upres)
    smS = Solver(name='small', gridSize=smgs, dim=dim)
    nmS = Solver(name='mid', gridSize=gs, dim=dim)
    xlS = Solver(name='xl', gridSize=xl_gs, dim=dim)

    sm_d, d, xl_d, d2, sm_d2 = (smS.create(RealGrid), nmS.create(RealGrid),
                                xlS.create(RealGrid), nmS.create(RealGrid),
                                smS.create(RealGrid))
    sm_m, m, xl_m, m2, sm_m2 = (smS.create(MACGrid), nmS.create(MACGrid),
                                xlS.create(MACGrid), nmS.create(MACGrid),
                                smS.create(MACGrid))
    sm_v, v, xl_v, v2, sm_v2 = (smS.create(VecGrid), nmS.create(VecGrid),
                                xlS.create(VecGrid), nmS.create(VecGrid),
                                smS.create(VecGrid))

    src = nmS.create(Cylinder, center=smgs * vec3(0.5, 0.5, 0.5),
                     radius=smgs.x * 0.251, z=smgs * vec3(0.151, 0, 0))
    src.applyToGrid(grid=sm_d, value=1)
    src.applyToGrid(grid=sm_v, value=vec3(1))
    src.applyToGrid(grid=sm_m, value=vec3(1))

    interpolateGrid(target=d, source=sm_d, orderSpace=ords)
    interpolateGrid(target=xl_d, source=d, orderSpace=ords)
    interpolateGrid(target=d2, source=xl_d, orderSpace=ords)
    interpolateGrid(target=sm_d2, source=d2, orderSpace=ords)
    interpolateGridVec3(target=v, source=sm_v, orderSpace=ords)
    interpolateGridVec3(target=xl_v, source=v, orderSpace=ords)
    interpolateGridVec3(target=v2, source=xl_v, orderSpace=ords)
    interpolateGridVec3(target=sm_v2, source=v2, orderSpace=ords)
    interpolateMACGrid(target=m, source=sm_m, orderSpace=ords)
    interpolateMACGrid(target=xl_m, source=m, orderSpace=ords)
    interpolateMACGrid(target=m2, source=xl_m, orderSpace=ords)
    interpolateMACGrid(target=sm_m2, source=m2, orderSpace=ords)

    dtg(f"{tag}scalar1", d, thr)
    dtg(f"{tag}scalar2", sm_d, thr)
    dtg(f"{tag}scalar3", sm_d2, thr)
    dtg(f"{tag}vec3t1", v, thr)
    dtg(f"{tag}vec3t2", sm_v, thr)
    dtg(f"{tag}vec3t3", sm_v2, thr)
    dtg(f"{tag}macvel1", m, thr)
    dtg(f"{tag}macvel2", sm_m, thr)
    dtg(f"{tag}macvel3", sm_m2, thr)


def scene(dtg):
    _run_chain(dtg, 2, 1, "", 1e-06)
    _run_chain(dtg, 2, 2, "hi_", 1e-05)
