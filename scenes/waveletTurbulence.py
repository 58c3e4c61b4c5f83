"""Smoke with wavelet-turbulence up-res. Port of reference
scenes/waveletTurbulence.py:1-160 onto the mantaflow_tpu scene API."""

import os

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))
from mantaflow_tpu import *
from mantaflow_tpu.scene.ops2 import (applyNoiseVec3, computeEnergy,
                                      computeWaveletCoeffs, interpolateGrid,
                                      interpolateMACGrid)

upres = 2
wltStrength = 0.4

dim = 2
res = 80
gs = vec3(res, int(1.5 * res), res if dim == 3 else 1)

sm = Solver(name="main", gridSize=gs, dim=dim)
sm.timestep = 1.5

velInflow = vec3(0.025, 0, 0)

noise = sm.create(NoiseField, fixedSeed=265, loadFromFile=True)
noise.posScale = vec3(20)
noise.clamp = True
noise.clampNeg = 0
noise.clampPos = 2
noise.valScale = 1
noise.valOffset = 0.075
noise.timeAnim = 0.3

source = Cylinder(sm, center=gs * vec3(0.3, 0.2, 0.5), radius=res * 0.081,
                  z=gs * vec3(0.081, 0, 0))
sourceVel = Cylinder(sm, center=gs * vec3(0.3, 0.2, 0.5), radius=res * 0.15,
                     z=gs * vec3(0.15, 0, 0))

xl_gs = vec3(upres * gs[0], upres * gs[1], upres * gs[2] if dim == 3 else 1)
xl = Solver(name="larger", gridSize=xl_gs, dim=dim)
xl.timestep = sm.timestep

xl_flags = xl.create(FlagGrid)
xl_vel = xl.create(MACGrid)
xl_density = xl.create(RealGrid)
xl_weight = xl.create(RealGrid)

xl_flags.initDomain()
xl_flags.fillGrid()

xl_source = Cylinder(xl, center=xl_gs * vec3(0.3, 0.2, 0.5),
                     radius=xl_gs[0] * 0.081, z=xl_gs * vec3(0.081, 0, 0))

xl_noise = xl.create(NoiseField, fixedSeed=265, loadFromFile=True)
xl_noise.posScale = noise.posScale
xl_noise.clamp = noise.clamp
xl_noise.clampNeg = noise.clampNeg
xl_noise.clampPos = noise.clampPos
xl_noise.valScale = noise.valScale
xl_noise.valOffset = noise.valOffset
xl_noise.timeAnim = noise.timeAnim * upres

wltnoise = xl.create(NoiseField, loadFromFile=True)
wltnoise.posScale = vec3(int(1.0 * gs[0])) * 0.5
wltnoise.timeAnim = 0.1
wltnoise2 = xl.create(NoiseField, loadFromFile=True)
wltnoise2.posScale = wltnoise.posScale * 2.0
wltnoise2.timeAnim = 0.1
wltnoise3 = xl.create(NoiseField, loadFromFile=True)
wltnoise3.posScale = wltnoise2.posScale * 2.0
wltnoise3.timeAnim = 0.1

flags = sm.create(FlagGrid)
vel = sm.create(MACGrid)
density = sm.create(RealGrid)
pressure = sm.create(RealGrid)
energy = sm.create(RealGrid)

bWidth = 0
flags.initDomain(boundaryWidth=bWidth)
flags.fillGrid()
setOpenBound(flags, bWidth, "Y", FlagOutflow | FlagEmpty)

if GUI:
    gui = Gui()
    gui.show()

frames = int(os.environ.get("FRAMES", 200))
for t in range(frames):
    mantaMsg("\nFrame %i, simulation time %f" % (sm.frame, sm.timeTotal))

    advectSemiLagrange(flags=flags, vel=vel, grid=density, order=2)
    advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)

    applyInflow = False
    if 0 <= sm.timeTotal < 50.0:
        densityInflow(flags=flags, density=density, noise=noise,
                      shape=source, scale=1, sigma=0.5)
        sourceVel.applyToGrid(grid=vel, value=velInflow * float(res))
        applyInflow = True

    setWallBcs(flags=flags, vel=vel)
    addBuoyancy(density=density, vel=vel, gravity=vec3(0, -1e-3, 0),
                flags=flags)
    vorticityConfinement(vel=vel, flags=flags, strength=0.3)

    solvePressure(flags=flags, vel=vel, pressure=pressure, cgMaxIterFac=1.0,
                  cgAccuracy=0.01)
    setWallBcs(flags=flags, vel=vel)

    computeEnergy(flags=flags, vel=vel, energy=energy)
    computeWaveletCoeffs(energy)
    sm.step()

    # xl solver: interpolate up, add turbulence octaves, substep advection
    interpolateGrid(target=xl_weight, source=energy)
    interpolateMACGrid(source=vel, target=xl_vel)

    applyNoiseVec3(flags=xl_flags, target=xl_vel, noise=wltnoise,
                   scale=wltStrength * 1.0, weight=xl_weight)
    applyNoiseVec3(flags=xl_flags, target=xl_vel, noise=wltnoise2,
                   scale=wltStrength * 0.6, weight=xl_weight)
    applyNoiseVec3(flags=xl_flags, target=xl_vel, noise=wltnoise3,
                   scale=wltStrength * 0.6 * 0.6, weight=xl_weight)

    for substep in range(upres):
        advectSemiLagrange(flags=xl_flags, vel=xl_vel, grid=xl_density,
                           order=2)

    if applyInflow:
        densityInflow(flags=xl_flags, density=xl_density, noise=xl_noise,
                      shape=xl_source, scale=1, sigma=0.5)
    xl.step()

    if t % 20 == 19:
        print("  lowres dens sum=%.1f  xl dens sum=%.1f  xl maxAbsVel=%.3f" %
              (density.to_numpy().sum(), xl_density.to_numpy().sum(),
               np.abs(xl_vel.to_numpy()).max()))
