"""2D circularly guided smoke (primal-dual fluid guiding).

Port of reference scenes/guiding_2d.py: spiral target velocity, stronger
guiding weight in the upper half, PD_fluid_guiding with the MG-static
preconditioner.

Headless: `python scenes/guiding_2d.py [frames]` (default 60).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from mantaflow_tpu import *  # noqa: E402

res0 = 64
scale = 2
res = res0 * scale
gs = vec3(res, res, 1)
s = Solver(name='main', gridSize=gs, dim=2)
s.timestep = 2.0 / scale
timings = Timings()

valAtMin = 1
valAtMax = 5
beta = 2
tau = 1.0
sigma = 0.99 / tau
theta = 1.0

flags = s.create(FlagGrid)
vel = s.create(MACGrid)
velT = s.create(MACGrid)
density = s.create(RealGrid)
pressure = s.create(RealGrid)
W = s.create(RealGrid)

bWidth = 1
flags.initDomain(boundaryWidth=bWidth)
flags.fillGrid()

if GUI:
    gui = Gui()
    gui.show()

source = s.create(Cylinder, center=gs * vec3(0.5, 0.2, 0.5),
                  radius=gs.y * 0.14, z=gs * vec3(0, 0.02 * 1.5, 0))
getSpiralVelocity(flags=flags, vel=velT, strength=0.5 * scale)

setGradientYWeight(W=W, minY=0, maxY=res // 2, valAtMin=valAtMin,
                   valAtMax=valAtMin)
setGradientYWeight(W=W, minY=res // 2, maxY=res, valAtMin=valAtMax,
                   valAtMax=valAtMax)

frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60
for t in range(frames):
    resetOutflow(flags=flags, real=density)
    source.applyToGrid(grid=density, value=1)

    advectSemiLagrange(flags=flags, vel=vel, grid=density, order=2)
    advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)

    setWallBcs(flags=flags, vel=vel)
    addBuoyancy(density=density, vel=vel,
                gravity=vec3(0, 0.25 * scale * -4e-3, 0), flags=flags)

    PD_fluid_guiding(vel=vel, velT=velT, flags=flags, weight=W,
                     blurRadius=beta, pressure=pressure, tau=tau,
                     sigma=sigma, theta=theta, preconditioner=PcMGStatic,
                     zeroPressureFixing=True)

    setWallBcs(flags=flags, vel=vel)
    s.step()
    if t % 20 == 19:
        mantaMsg("frame %d density sum %.1f" % (t + 1, density.getL1()), 0)

mantaMsg("guiding_2d: done", 0)
