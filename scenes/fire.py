"""Flame with smoke and adaptive time-stepping.

Port of reference scenes/fire.py: fuel/react/heat/density transport,
processBurn/updateFlame chemistry, fuel-weighted vorticity confinement,
double buoyancy, open top/bottom bounds.

Headless: `python scenes/fire.py [frames]` (default shortened to 40).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from mantaflow_tpu import *  # noqa: E402

dim = 3
res = 52
gs = vec3(res, res, res)
s = Solver(name='main', gridSize=gs, dim=dim)

smokeDensity = -0.001
smokeTempDiff = 0.1

s.frameLength = 1.2
s.timestepMin = 0.2
s.timestepMax = 2.0
s.cfl = 3.0
s.timestep = (s.timestepMax + s.timestepMin) * 0.5
timings = Timings()

flags = s.create(FlagGrid)
vel = s.create(MACGrid)
density = s.create(RealGrid)
react = s.create(RealGrid)
fuel = s.create(RealGrid)
heat = s.create(RealGrid)
flame = s.create(RealGrid)
pressure = s.create(RealGrid)
doOpen = True

frames = int(sys.argv[1]) if len(sys.argv) > 1 else 40

noise = s.create(NoiseField, loadFromFile=True)
noise.posScale = vec3(45)
noise.clamp = True
noise.clampNeg = 0
noise.clampPos = 1
noise.valScale = 1
noise.valOffset = 0.75
noise.timeAnim = 0.2

gravity = vec3(0, -0.0981, 0)
vortGlobal = 0.1
vortFlames = 0.5

bWidth = 1
flags.initDomain(boundaryWidth=bWidth)
flags.fillGrid()
if doOpen:
    setOpenBound(flags, bWidth, 'yY', FlagOutflow | FlagEmpty)

if GUI:
    gui = Gui()
    gui.show(True)

boxSize = vec3(res / 8, 0.05 * res, res / 8)
boxCenter = gs * vec3(0.5, 0.15, 0.5)
sourceBox = s.create(Box, center=boxCenter, size=boxSize)

while s.frame < frames:
    maxvel = vel.getMax()
    s.adaptTimestep(maxvel)
    mantaMsg('\nFrame %i, time-step size %f' % (s.frame, s.timestep))

    if s.timeTotal < 200:
        densityInflow(flags=flags, density=density, noise=noise,
                      shape=sourceBox, scale=1, sigma=0.5)
        densityInflow(flags=flags, density=heat, noise=noise,
                      shape=sourceBox, scale=1, sigma=0.5)
        densityInflow(flags=flags, density=fuel, noise=noise,
                      shape=sourceBox, scale=1, sigma=0.5)
        densityInflow(flags=flags, density=react, noise=noise,
                      shape=sourceBox, scale=1, sigma=0.5)

    processBurn(fuel=fuel, density=density, react=react, heat=heat)

    advectSemiLagrange(flags=flags, vel=vel, grid=density, order=2)
    advectSemiLagrange(flags=flags, vel=vel, grid=heat, order=2)
    advectSemiLagrange(flags=flags, vel=vel, grid=fuel, order=2)
    advectSemiLagrange(flags=flags, vel=vel, grid=react, order=2)
    advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)

    if doOpen:
        resetOutflow(flags=flags, real=density)

    flame.copyFrom(fuel)
    flame.multConst(vortFlames)  # temporarily misuse flame grid
    vorticityConfinement(vel=vel, flags=flags, strength=vortGlobal,
                         strengthCell=flame)

    addBuoyancy(flags=flags, density=density, vel=vel,
                gravity=(gravity * smokeDensity))
    addBuoyancy(flags=flags, density=heat, vel=vel,
                gravity=(gravity * smokeTempDiff))

    setWallBcs(flags=flags, vel=vel)
    solvePressure(flags=flags, vel=vel, pressure=pressure)

    updateFlame(react=react, flame=flame)
    s.step()

mantaMsg("fire: done, flame max %.3f density sum %.1f" %
         (flame.getMax(), density.getL1()), 0)
