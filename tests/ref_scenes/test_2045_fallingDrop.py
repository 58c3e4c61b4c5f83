"""Free-surface falling drop (3D) vs reference-binary goldens.

Compact port of tools/tests/test_2045_fallingDrop.py: levelset reinit with
velocity transport, MacCormack advection, ghost-fluid pressure solve.

Runs the native reference-exact fast march (mantaflow_tpu/native).
Thresholds 3e-2/5e-3 vs the reference's 1e-5: float op-order drift over
18 frames through the 5e-5-accuracy CG (measured ~1e-3-1e-2 phi, ~1e-4
vel across interpolation-ordering variants).
"""
from mantaflow_tpu import *


def scene(dtg):
    dim, res, frames = 3, 45, 18
    gs = vec3(res, res, res)
    s = Solver(name='main', gridSize=gs, dim=dim)
    s.timestep = 0.6
    accuracy = 5e-5

    flags = s.create(FlagGrid)
    vel = s.create(MACGrid)
    pressure = s.create(RealGrid)

    flags.initDomain(boundaryWidth=0)
    liqDrop = s.create(Box, p0=gs * vec3(0.4, 0.75, 0.4),
                       p1=gs * vec3(0.6, 0.95, 0.6))
    phi = liqDrop.computeLevelset()
    flags.updateFromLevelset(phi)

    for t in range(frames):
        phi.reinitMarching(flags=flags, velTransport=vel)
        advectSemiLagrange(flags=flags, vel=vel, grid=phi, order=2,
                           clampMode=1)
        flags.updateFromLevelset(phi)

        advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2,
                           clampMode=1)
        addGravity(flags=flags, vel=vel, gravity=vec3(0, -0.0125, 0))

        setWallBcs(flags=flags, vel=vel)
        solvePressure(flags=flags, vel=vel, pressure=pressure,
                      cgMaxIterFac=0.5, cgAccuracy=accuracy, phi=phi)
        setWallBcs(flags=flags, vel=vel)
        s.step()

    dtg("phi", phi, 3e-02)
    dtg("vel", vel, 5e-03)
