# Port of the reference scenes/plume_2d.py: 2D buoyant smoke plume with open
# top/bottom boundaries. Run: PYTHONPATH=. python scenes/plume_2d.py
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))
from mantaflow_tpu import *

res = 64
gs = vec3(res, res, 1)
s = Solver(name="main", gridSize=gs, dim=2)
s.timestep = 1.0
timings = Timings()

flags = s.create(FlagGrid)
vel = s.create(MACGrid)
density = s.create(RealGrid)
pressure = s.create(RealGrid)

bWidth = 1
flags.initDomain(boundaryWidth=bWidth)
flags.fillGrid()
setOpenBound(flags, bWidth, "yY", FlagOutflow | FlagEmpty)

source = s.create(Cylinder, center=gs * vec3(0.5, 0.1, 0.5),
                  radius=res * 0.14, z=gs * vec3(0, 0.02, 0))

for t in range(400):
    mantaMsg("\nFrame %i" % s.frame)
    if t < 300:
        source.applyToGrid(grid=density, value=1)
    advectSemiLagrange(flags=flags, vel=vel, grid=density, order=2)
    advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)
    resetOutflow(flags=flags, real=density)
    setWallBcs(flags=flags, vel=vel)
    addBuoyancy(density=density, vel=vel, gravity=vec3(0, -4e-3, 0),
                flags=flags)
    solvePressure(flags=flags, vel=vel, pressure=pressure)
    s.step()
    if s.frame % 50 == 0:
        projectPpmFull(density, "plume_%04d.ppm" % s.frame)
