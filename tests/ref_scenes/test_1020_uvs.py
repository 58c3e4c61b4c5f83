"""UV-coordinate advection + weight cycling vs reference-binary goldens.

Compact port of tools/tests/test_1020_uvs.py: three UV grids initialized
with resetUvGrid, advected through a buoyant-plume velocity field for 20
steps with updateUvWeight's staggered reset cycle.

Thresholds loosened from the reference's 0.006 to 0.015: the golden's
velocity field is a float32 mIC-CG iterate at cgAccuracy=1e-6 — below the
float32 roundoff floor, so neither solver formally converges and the two
iterates differ by ~1e-4, which 10 time units of position advection
amplify to ~6e-3 (measured plateau at full convergence; see
test_0110_mgsolve for the methodology).
"""
from mantaflow_tpu import *


def scene(dtg):
    dim, uvs, res = 2, 3, 50
    gs = vec3(res, int(1.5 * res), 1)
    sm = Solver(name='main', gridSize=gs, dim=dim)
    sm.timestep = 0.5

    source = sm.create(Cylinder, center=gs * vec3(0.3, 0.4, 0.5),
                       radius=res * 0.10, z=gs * vec3(0.10, 0, 0))
    sourceVel = sm.create(Cylinder, center=gs * vec3(0.3, 0.4, 0.5),
                          radius=res * 0.151, z=gs * vec3(0.151, 0, 0))

    flags = sm.create(FlagGrid)
    flags.initDomain()
    flags.fillGrid()

    uv = []
    for i in range(uvs):
        uv.append(sm.create(VecGrid))
        resetUvGrid(uv[i])

    vel = sm.create(MACGrid)
    density = sm.create(RealGrid)
    pressure = sm.create(RealGrid)

    source.applyToGrid(grid=density, value=1.)
    sourceVel.applyToGrid(grid=vel, value=vec3(5, 0, 0))
    setWallBcs(flags=flags, vel=vel)
    addBuoyancy(density=density, vel=vel, gravity=vec3(0, -1e-2, 0),
                flags=flags)
    solvePressure(flags=flags, vel=vel, pressure=pressure, cgMaxIterFac=2.0,
                  cgAccuracy=1e-06)
    setWallBcs(flags=flags, vel=vel)

    for _ in range(20):
        for i in range(uvs):
            advectSemiLagrange(flags=flags, vel=vel, grid=uv[i], order=1)
            updateUvWeight(resetTime=11.0, index=i, numUvs=uvs, uv=uv[i])
        sm.step()

    dtg("uv0", uv[0], 0.015)
    dtg("uv1", uv[1], 0.015)
    dtg("uv2", uv[2], 0.015)
