"""4D space-time grid surface (grid4d.cpp free ops), mirroring the flow of
reference tools/tests/test_0042_interpol4d.py: region stamping, scalar and
Vec4 down/up/down interpolation round trips, slices, maxDiff and bounds."""
import numpy as np

from mantaflow_tpu import *
from mantaflow_tpu.scene.api import (Grid4Real, Grid4Int, Grid4Vec3,
                                     Grid4Vec4, Vec4, getComp4d, setComp4d,
                                     getSliceFrom4d, getSliceFrom4dVec,
                                     grid4dMaxDiff, grid4dMaxDiffVec4,
                                     interpolateGrid4d, interpolateGrid4dVec,
                                     setRegion4d, setRegion4dVec4)


def _solvers(res=16, upres=2):
    sm = Solver(name="sm", gridSize=vec3(res // upres, res // upres,
                                         res // upres),
                fourthDim=res // upres)
    md = Solver(name="md", gridSize=vec3(res, res, res), fourthDim=res)
    return sm, md


def test_interpol4d_roundtrip():
    sm, md = _solvers()
    res_sm = sm.domain.size[0]
    rs, re = res_sm * 0.3, res_sm * 0.7

    sm_d = sm.create(Grid4Real)
    d = md.create(Grid4Real)
    sm_d2 = sm.create(Grid4Real)
    setRegion4d(sm_d, start=Vec4(rs), end=Vec4(re), value=1)
    assert sm_d.to_numpy().sum() > 0

    interpolateGrid4d(target=d, source=sm_d)
    interpolateGrid4d(target=sm_d2, source=d)
    # small -> medium -> small round trip keeps the region (linear interp
    # smears at most the boundary band)
    diff = grid4dMaxDiff(sm_d, sm_d2)
    assert diff < 1.0
    mid = int(res_sm * 0.5)
    assert abs(sm_d2.to_numpy()[mid, mid, mid, mid] - 1.0) < 1e-5
    # interior of the upsampled region is exactly 1
    m2 = md.domain.size[0] // 2
    assert abs(d.to_numpy()[m2, m2, m2, m2] - 1.0) < 1e-5


def test_interpol4d_vec4_and_components():
    sm, md = _solvers()
    res_sm = sm.domain.size[0]
    rs, re = res_sm * 0.3, res_sm * 0.7

    sm_v = sm.create(Grid4Vec4)
    v = md.create(Grid4Vec4)
    sm_v2 = sm.create(Grid4Vec4)
    setRegion4dVec4(sm_v, start=Vec4(rs), end=Vec4(re),
                    value=Vec4(1, 2, 3, 4))
    interpolateGrid4dVec(target=v, source=sm_v)
    interpolateGrid4dVec(target=sm_v2, source=v)
    # maxDiffVec sums per-component diffs per cell; boundary smear of a
    # (1,2,3,4) step can reach sum 10, interior must match exactly
    assert grid4dMaxDiffVec4(sm_v, sm_v2) <= 10.0
    mid = int(res_sm * 0.5)
    got = sm_v2.to_numpy()[:, mid, mid, mid, mid]
    assert np.allclose(got, [1, 2, 3, 4], atol=1e-5)

    # component get/set round trip
    comp = sm.create(Grid4Real)
    getComp4d(src=sm_v, dst=comp, c=2)
    assert abs(comp.to_numpy()[mid, mid, mid, mid] - 3.0) < 1e-6
    comp.multConst(2.0)
    setComp4d(src=comp, dst=sm_v, c=2)
    assert abs(sm_v.to_numpy()[2, mid, mid, mid, mid] - 6.0) < 1e-6

    # slices: xyz into a Vec3 grid, t channel into a Real grid
    vel3 = md.create(VecGrid)
    tch = md.create(RealGrid)
    getSliceFrom4dVec(src=v, srct=md.domain.size[0] // 2, dst=vel3, dstt=tch)
    m2 = md.domain.size[0] // 2
    assert np.allclose(vel3.to_numpy()[:, m2, m2, m2], [1, 2, 3], atol=1e-5)
    assert abs(tch.to_numpy()[m2, m2, m2] - 4.0) < 1e-5


def test_grid4d_bounds_and_interp_point():
    s = Solver(name="b", gridSize=vec3(8, 8, 8), fourthDim=8)
    g = s.create(Grid4Real)
    g.setConst(1.0)
    g.setBound(5.0, boundaryWidth=0)
    a = g.to_numpy()
    assert a[0].max() == 5.0 and a[-1].min() == 5.0
    assert a[4, 4, 4, 4] == 1.0
    assert a[4, 0, 4, 4] == 5.0

    g.setBoundNeumann(0)
    a = g.to_numpy()
    assert a[0, 4, 4, 4] == 1.0  # copied from interior
    assert (a == 1.0).all()

    # quadrilinear point lookup at a cell center hits the stored value
    g.from_numpy(np.arange(8 ** 4, dtype=np.float32).reshape(8, 8, 8, 8))
    want = g.to_numpy()[3, 2, 5, 4]
    got = g.getInterpolated((4.5, 5.5, 2.5, 3.5))  # pos (x,y,z,t) + 0.5
    assert abs(got - want) < 1e-4

    gi = s.create(Grid4Int)
    gi.setConst(3)
    gi2 = s.create(Grid4Int)
    gi2.setConst(5)
    from mantaflow_tpu.scene.api import grid4dMaxDiffInt
    assert grid4dMaxDiffInt(gi, gi2) == 2.0

    gv = s.create(Grid4Vec3)
    assert gv.data.shape == (3, 8, 8, 8, 8)
