"""Lid-driven cavity with implicit viscosity (Re 10k) + CFL quickstart.

Port of reference scenes/lidDrivenCavity.py.

Headless: `python scenes/lidDrivenCavity.py [steps]` (default 60).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from mantaflow_tpu import *  # noqa: E402

worldScale = 1.0
visc = 0.0001 / (worldScale * worldScale)  # Re 10k
lidVel = 1.00
doQuickstart = True

Re = lidVel * worldScale / visc if visc > 0. else 0.

res = 100
gDim = 2
gs = vec3(res, res, 1)
s = Solver(name='main', gridSize=gs, dim=gDim)

s.frameLength = 0.1
s.timestepMin = s.frameLength * 0.01
s.timestepMax = s.frameLength * 1.0
s.cfl = 1.0
s.timestep = s.frameLength

if doQuickstart:
    s.cfl = 10.0
    mantaMsg("Note - quickstart active, starting with high CFL number, "
             "reduced later on", 0)

density = s.create(RealGrid)
flags = s.create(FlagGrid)
flags.initDomain(boundaryWidth=1)
flags.fillGrid()

vel = s.create(MACGrid)
pressure = s.create(RealGrid)
timings = Timings()

if GUI:
    gui = Gui()
    gui.show(True)

lid = s.create(Box, p0=gs * vec3(0.0, 1.0 - (1. / float(gs.x) * 3.1), 0.0),
               p1=gs * vec3(1.0, 1.0, 1.0))
source = s.create(Cylinder, center=gs * vec3(0.5, 0.5, 0.5),
                  radius=res * 0.10, z=gs * vec3(0, 0.10, 0))

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 60
lastFrame = -1
for t in range(steps):
    maxvel = vel.getMax()
    s.adaptTimestep(maxvel)

    if doQuickstart:
        if s.cfl > 5.0 and s.timeTotal > 20.:
            s.cfl = 5.0
        if s.cfl > 1.0 and s.timeTotal > 30.:
            s.cfl = 1.0

    lid.applyToGrid(grid=vel, value=Vec3(lidVel * float(gs.x), 0, 0))
    if (lastFrame != s.frame) and (s.frame % 25 == 0):
        source.applyToGrid(grid=density, value=1)

    advectSemiLagrange(flags=flags, vel=vel, grid=density, order=2,
                       clampMode=2)
    advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2, clampMode=2)
    resetOutflow(flags=flags, real=density)

    if visc > 0.:
        alphaV = visc * s.timestep * float(res * res)
        setWallBcs(flags=flags, vel=vel)
        cgSolveDiffusion(flags, vel, alphaV)

    setWallBcs(flags=flags, vel=vel)
    solvePressure(flags=flags, vel=vel, pressure=pressure)

    lastFrame = s.frame
    s.step()

mantaMsg("lidDrivenCavity: done (Re=%d), vel max %.2f" %
         (int(Re), vel.getMax()), 0)
