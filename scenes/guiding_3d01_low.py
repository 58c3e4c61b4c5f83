"""3D buoyant plume at low resolution — generates guiding velocities for the
high-res guided run (guiding_3d02_high.py).
Port of reference scenes/guiding_3d01_low.py:1-67.

Run: PYTHONPATH=. python scenes/guiding_3d01_low.py [frames]"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from mantaflow_tpu import *

res0 = 40
scale = 1.0
res = int(res0 * scale)
gs = vec3(res, int(2.0 * res), res)
s = Solver(name="main", gridSize=gs, dim=3)
s.timestep = 0.65 * scale
numFrames = int(sys.argv[1]) if len(sys.argv) > 1 else 200
timings = Timings()

out_dir = os.environ.get("MANTA_OUT", "/tmp/guiding3d_out")
os.makedirs(out_dir, exist_ok=True)
output_uni = os.path.join(out_dir, "plume3DLowRes_%04d.uni")

flags = s.create(FlagGrid)
vel = s.create(MACGrid)
velT = s.create(MACGrid)
density = s.create(RealGrid)
pressure = s.create(RealGrid)

noise = s.create(NoiseField, loadFromFile=True)
noise.posScale = vec3(0)
noise.clamp = True
noise.clampNeg = 0
noise.clampPos = 1
noise.valScale = 1
noise.valOffset = 0.75
noise.timeAnim = 0.2

bWidth = 0
flags.initDomain(boundaryWidth=bWidth)
flags.fillGrid()
setOpenBound(flags, bWidth, "yY", FlagOutflow | FlagEmpty)

source = s.create(Cylinder, center=gs * vec3(0.5, 0.05, 0.5),
                  radius=res * 0.1, z=gs * vec3(0, 0.02, 0))

for t in range(int(numFrames * scale)):
    densityInflow(flags=flags, density=density, noise=noise, shape=source,
                  scale=1, sigma=0.5)

    advectSemiLagrange(flags=flags, vel=vel, grid=density, order=2)
    advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)
    resetOutflow(flags=flags, real=density)

    setWallBcs(flags=flags, vel=vel)
    addBuoyancy(density=density, vel=vel, gravity=vec3(0, -1e-3 * scale, 0),
                flags=flags)

    solvePressure(flags=flags, vel=vel, pressure=pressure)

    setWallBcs(flags=flags, vel=vel)
    vel.save(output_uni % t)

    s.step()

mantaMsg("guiding_3d01_low done: %d guiding fields in %s"
         % (int(numFrames * scale), out_dir))
