"""Second-order (fractional) obstacle boundaries vs reference-binary
goldens. Compact port of tools/tests/test_1040_secOrderBnd.py: inner
sphere obstacle via updateFractions/setObstacleFlags, vortex velocity
init, 10 steps with fraction-aware wall BCs + pressure solve.
"""
from mantaflow_tpu import *


def scene(dtg):
    dim, res = 2, 16
    gs = vec3(res, res, 1)
    s = FluidSolver(name='main', gridSize=gs, dim=dim)
    s.timestep = 1

    flags = s.create(FlagGrid)
    vel = s.create(MACGrid)
    pressure = s.create(RealGrid)
    fractions = s.create(MACGrid)
    density = s.create(RealGrid)

    flags.initDomain()

    center = gs * vec3(0.5, 0.5, 0.5)
    radius = res * 0.4
    sphere = s.create(Sphere, center=center, radius=radius)
    phiObs = sphere.computeLevelset()
    phiObs.multConst(-1)

    initVortexVelocity(phiObs=phiObs, vel=vel, center=center, radius=radius)

    updateFractions(flags=flags, phiObs=phiObs, fractions=fractions)
    setObstacleFlags(flags=flags, phiObs=phiObs, fractions=fractions)
    flags.fillGrid()

    for t in range(10):
        advectSemiLagrange(flags=flags, vel=vel, grid=density, order=2,
                           orderSpace=1, clampMode=1)
        advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2,
                           strength=1.0, clampMode=1)
        setWallBcs(flags=flags, vel=vel, fractions=fractions, phiObs=phiObs)
        extrapolateMACSimple(flags=flags, vel=vel, distance=1)
        solvePressure(flags=flags, vel=vel, pressure=pressure,
                      fractions=fractions)
        setWallBcs(flags=flags, vel=vel, fractions=fractions, phiObs=phiObs)
        extrapolateMACSimple(flags=flags, vel=vel, distance=1)
        s.step()

    dtg("frac", fractions, 0.0001)
    dtg("vel", vel, 0.0001)
