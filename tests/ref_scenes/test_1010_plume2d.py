"""2D buoyant plume, 30 frames, vs reference-binary goldens.

Compact port of tools/tests/test_1010_plume2d.py (64^2, order-1 advection,
buoyancy, CG 1e-5) at the reference's loose (float-build) thresholds;
measured agreement vs the reference binary is ~6e-5 (the pressure
projection is unique, so the CG-path difference does not accumulate).
"""
from mantaflow_tpu import *


def scene(dtg):
    res = 64
    gs = vec3(res, res, 1)
    s = Solver(name='main', gridSize=gs, dim=2)
    s.timestep = 1.0
    flags = s.create(FlagGrid)
    vel = s.create(MACGrid)
    density = s.create(RealGrid)
    pressure = s.create(RealGrid)
    flags.initDomain()
    flags.fillGrid()
    source = s.create(Cylinder, center=gs * vec3(0.5, 0.1, 0.5),
                      radius=res * 0.14, z=gs * vec3(0, 0.02, 0))
    for t in range(30):
        source.applyToGrid(grid=density, value=1)
        advectSemiLagrange(flags=flags, vel=vel, grid=density, order=1)
        advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=1)
        setWallBcs(flags=flags, vel=vel)
        addBuoyancy(density=density, vel=vel, gravity=vec3(0, -9e-3, 0),
                    flags=flags)
        solvePressure(flags=flags, vel=vel, pressure=pressure,
                      cgAccuracy=1e-05, cgMaxIterFac=5.)
        s.step()
    dtg("dens", density, 0.0005)
    dtg("vel", vel, 0.0005)
