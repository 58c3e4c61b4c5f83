"""Misc parity ops: resampling, converters, stomp, center of mass, timings."""
import numpy as np
import jax.numpy as jnp

from mantaflow_tpu import *
from mantaflow_tpu.scene.ops2 import (resampleMacToVec3, resampleVec3ToMac,
                                      swapComponents, stompGrid,
                                      resetInObstacle, addTestParts,
                                      pdataMaxDiff, calcCenterOfMass,
                                      obstacleGradient, copyArrayToGridReal,
                                      copyGridToArrayReal,
                                      copyGridToArrayVec3)


def test_resample_and_converters():
    res = 12
    s = Solver(name="x", gridSize=vec3(res, res, res))
    v3 = s.create(VecGrid)
    rng = np.random.RandomState(0)
    v3.from_numpy(rng.randn(3, res, res, res).astype(np.float32))
    mac = s.create(MACGrid)
    resampleVec3ToMac(v3, mac)
    back = s.create(VecGrid)
    resampleMacToVec3(mac, back)
    # round trip is a smoothing, values stay close in the interior
    a, b = v3.to_numpy()[:, 2:-2, 2:-2, 2:-2], back.to_numpy()[:, 2:-2, 2:-2, 2:-2]
    assert np.abs(a - b).mean() < np.abs(a).mean()

    swapComponents(v3, 1, 0, 2)
    np.testing.assert_array_equal(v3.to_numpy()[0],
                                  np.asarray(mac.data * 0)[0] * 0
                                  + v3.to_numpy()[0])

    g = s.create(RealGrid)
    arr = rng.rand(res, res, res).astype(np.float32)
    copyArrayToGridReal(arr, g)
    out = np.zeros_like(arr)
    copyGridToArrayReal(g, out)
    np.testing.assert_array_equal(arr, out)
    outv = np.zeros((res, res, res, 3), np.float32)
    copyGridToArrayVec3(v3, outv)
    assert np.isfinite(outv).all()

    stompGrid(g, 0.5)
    d = g.to_numpy()
    assert ((d == 0) | (d >= 0.5)).all()


def test_com_pdata_reset_timings():
    res = 16
    s = Solver(name="x", gridSize=vec3(res, res, res))
    flags = s.create(FlagGrid)
    flags.initDomain()
    flags.fillGrid()
    density = s.create(RealGrid)
    Sphere(s, center=vec3(4, 10, 8), radius=2).applyToGrid(grid=density,
                                                           value=1.0)
    com = calcCenterOfMass(density)
    assert abs(com.x - 4.5) < 1.0 and abs(com.y - 10.5) < 1.0

    vel = s.create(MACGrid)
    vel.setConst(vec3(1, 0, 0))
    box = Box(s, p0=vec3(6, 6, 6), p1=vec3(10, 10, 10))
    box.applyToGrid(grid=flags, value=FlagObstacle, respectFlags=None)
    resetInObstacle(flags=flags, vel=vel, density=density)
    assert float(jnp.abs(vel.data[0][8, 8, 8])) == 0.0
    assert float(density.data[8, 8, 8]) == 0.0

    g = obstacleGradient(flags)
    assert np.isfinite(g.to_numpy()).all()

    pp = s.create(BasicParticleSystem)
    addTestParts(pp, 5)
    assert pp.pySize() == 5
    pa = pp.create(PdataReal)
    pb = pp.create(PdataReal)
    pa.setConst(2.0)
    pb.setConst(1.5)
    assert abs(pdataMaxDiff(pa, pb) - 0.5) < 1e-6

    t = Timings()
    t.add("demo", 0.001)
    t.display()


def test_cubic_advection_and_grid4d():
    # order-space-2 advection runs and stays bounded
    res = 16
    s = Solver(name="c", gridSize=vec3(res, res, 1), dim=2)
    flags = s.create(FlagGrid)
    flags.initDomain()
    flags.fillGrid()
    vel = s.create(MACGrid)
    vel.setConst(vec3(0.4, 0.2, 0))
    d = s.create(RealGrid)
    Sphere(s, center=vec3(6, 8, 0.5), radius=3).applyToGrid(grid=d, value=1.0)
    m0 = d.to_numpy().sum()
    for _ in range(4):
        advectSemiLagrange(flags=flags, vel=vel, grid=d, order=2,
                           orderSpace=2)
    dn = d.to_numpy()
    assert np.isfinite(dn).all()
    assert 0.5 * m0 < dn.sum() < 1.5 * m0
    # blob moved along the velocity
    com_x = (dn * np.arange(res)[None, None, :]).sum() / dn.sum()
    assert com_x > 6.5

    # 4d grid container
    from mantaflow_tpu import Grid4Real, getSliceFrom4d
    s4 = Solver(name="g4", gridSize=vec3(8, 8, 8), fourthDim=3)
    g4 = s4.create(Grid4Real)
    assert g4.data.shape == (3, 8, 8, 8)
    g4.setConst(2.0)
    assert g4.getMaxAbs() == 2.0


def test_headless_gui():
    """Gui is a headless stand-in: interaction no-ops, screenshot renders a
    grid slice to PPM when given one."""
    import os
    from mantaflow_tpu import Gui
    s = Solver(name="g", gridSize=vec3(12, 12, 1), dim=2)
    d = s.create(RealGrid)
    d.setConst(0.5)
    gui = Gui()
    gui.show()
    gui.pause()
    gui.update()
    gui.nextRealGrid()
    p = "/tmp/_gui_test_shot.ppm"
    if os.path.exists(p):
        os.remove(p)
    gui.screenshot(p)  # no grid: warns, writes nothing
    assert not os.path.exists(p)
    gui.screenshot(p, grid=d)
    assert os.path.exists(p)
    os.remove(p)
