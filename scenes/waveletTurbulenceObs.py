"""Wavelet-turbulence smoke with an obstacle and UV coordinate advection.
Port of reference scenes/waveletTurbulenceObs.py:1-202 (low-res sim +
4x up-res solver, energy weighting extrapolated through the obstacle
boundary layer).

Run: PYTHONPATH=. python scenes/waveletTurbulenceObs.py [frames]"""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from mantaflow_tpu import *

upres = 4
wltStrength = 0.3
uvs = 1

octaves = 0
if upres > 0:
    octaves = int(math.log(upres) / math.log(2.0) + 0.5)

dim = 2
res = 80
gs = vec3(res, int(1.5 * res), 1)

sm = Solver(name="main", gridSize=gs, dim=dim)
sm.timestep = 1.5
sm.frameLength = sm.timestep
timings = Timings()

velInflow = vec3(0.015, 0, 0)

noise = NoiseField(parent=sm, fixedSeed=265, loadFromFile=True)
noise.posScale = vec3(20)
noise.clamp = True
noise.clampNeg = 0
noise.clampPos = 2
noise.valScale = 1
noise.valOffset = 0.075
noise.timeAnim = 0.3

source = Cylinder(parent=sm, center=gs * vec3(0.3, 0.2, 0.5),
                  radius=res * 0.081, z=gs * vec3(0.081, 0, 0))
sourceVel = Cylinder(parent=sm, center=gs * vec3(0.3, 0.2, 0.5),
                     radius=res * 0.15, z=gs * vec3(0.15, 0, 0))
obs = Sphere(parent=sm, center=gs * vec3(0.5, 0.5, 0.5), radius=res * 0.15)

if upres > 0:
    xl_gs = vec3(upres * gs.x, upres * gs.y, 1)
    xl = Solver(name="larger", gridSize=xl_gs, dim=dim)
    xl.timestep = sm.timestep
    xl.frameLength = xl.timestep

    xl_flags = xl.create(FlagGrid)
    xl_vel = xl.create(MACGrid)
    xl_density = xl.create(RealGrid)

    xl_flags.initDomain()
    xl_flags.fillGrid()

    xl_source = Cylinder(parent=xl, center=xl_gs * vec3(0.3, 0.2, 0.5),
                         radius=xl_gs.x * 0.081,
                         z=xl_gs * vec3(0.081, 0, 0))
    xl_obs = Sphere(parent=xl, center=xl_gs * vec3(0.5, 0.5, 0.5),
                    radius=xl_gs.x * 0.15)
    xl_obs.applyToGrid(grid=xl_flags, value=FlagObstacle)

    xl_noise = NoiseField(parent=xl, fixedSeed=265, loadFromFile=True)
    xl_noise.posScale = noise.posScale
    xl_noise.clamp = noise.clamp
    xl_noise.clampNeg = noise.clampNeg
    xl_noise.clampPos = noise.clampPos
    xl_noise.valScale = noise.valScale
    xl_noise.valOffset = noise.valOffset
    xl_noise.timeAnim = noise.timeAnim * upres

bWidth = 1
flags = sm.create(FlagGrid)
flags.initDomain(boundaryWidth=bWidth)
flags.fillGrid()
setOpenBound(flags, bWidth, "yY", FlagOutflow | FlagEmpty)
obs.applyToGrid(grid=flags, value=FlagObstacle)

uv = []
for i in range(uvs):
    uvGrid = sm.create(VecGrid)
    uv.append(uvGrid)
    resetUvGrid(uv[i])

vel = sm.create(MACGrid)
density = sm.create(RealGrid)
pressure = sm.create(RealGrid)
energy = sm.create(RealGrid)
tempFlag = sm.create(FlagGrid)

if upres > 0:
    xl_wltnoise = NoiseField(parent=xl, loadFromFile=True)
    xl_wltnoise.posScale = vec3(int(1.0 * gs.x)) * 0.5
    xl_wltnoise.timeAnim = 0.1

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 200
for t in range(n_frames):
    mantaMsg("\nFrame %i, simulation time %f" % (sm.frame, sm.timeTotal))

    advectSemiLagrange(flags=flags, vel=vel, grid=density, order=2)
    advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)

    for i in range(uvs):
        advectSemiLagrange(flags=flags, vel=vel, grid=uv[i], order=2)
        updateUvWeight(resetTime=16.5, index=i, numUvs=uvs, uv=uv[i])

    applyInflow = False
    if 0 <= sm.timeTotal < 50.0:
        densityInflow(flags=flags, density=density, noise=noise,
                      shape=source, scale=1, sigma=0.5)
        sourceVel.applyToGrid(grid=vel, value=(velInflow * float(res)))
        applyInflow = True

    setWallBcs(flags=flags, vel=vel)
    addBuoyancy(density=density, vel=vel, gravity=vec3(0, -1e-3, 0),
                flags=flags)

    vorticityConfinement(vel=vel, flags=flags, strength=0.4)

    solvePressure(flags=flags, vel=vel, pressure=pressure, cgMaxIterFac=1.0,
                  cgAccuracy=0.01)
    setWallBcs(flags=flags, vel=vel)

    computeEnergy(flags=flags, vel=vel, energy=energy)

    tempFlag.copyFrom(flags)
    extrapolateSimpleFlags(flags=flags, val=tempFlag, distance=2,
                           flagFrom=FlagObstacle, flagTo=FlagFluid)
    extrapolateSimpleFlags(flags=tempFlag, val=energy, distance=6,
                           flagFrom=FlagFluid, flagTo=FlagObstacle)
    computeWaveletCoeffs(energy)

    sm.step()

    if upres > 0:
        interpolateMACGrid(source=vel, target=xl_vel)

        sStr = 1.0 * wltStrength
        sPos = 2.0
        for o in range(octaves):
            for i in range(uvs):
                uvWeight = getUvWeight(uv[i])
                applyNoiseVec3(flags=xl_flags, target=xl_vel,
                               noise=xl_wltnoise, scale=sStr * uvWeight,
                               scaleSpatial=sPos, weight=energy, uv=uv[i])
            sStr *= 0.06  # magic kolmogorov factor
            sPos *= 2.0

        for substep in range(upres):
            advectSemiLagrange(flags=xl_flags, vel=xl_vel, grid=xl_density,
                               order=2)

        if applyInflow:
            densityInflow(flags=xl_flags, density=xl_density, noise=xl_noise,
                          shape=xl_source, scale=1, sigma=0.5)
        xl.step()

mantaMsg("waveletTurbulenceObs done: density max %.3f, xl max %.3f"
         % (density.getMax(), xl_density.getMax() if upres else 0.0))
