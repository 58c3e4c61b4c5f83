"""High-res 3D plume guided by the low-res sim's velocities (PD guiding).
Port of reference scenes/guiding_3d02_high.py:1-100. Reads the .uni fields
written by guiding_3d01_low.py from MANTA_OUT (default /tmp/guiding3d_out).

Run: PYTHONPATH=. python scenes/guiding_3d02_high.py [frames]"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from mantaflow_tpu import *

timestep = 0.65
res1 = 40
factor = 2
res2 = int(res1 * factor)

gs2 = vec3(res2, int(2.0 * res2), res2)
s2 = Solver(name="main", gridSize=gs2, dim=3)
s2.timestep = timestep
timings = Timings()

out_dir = os.environ.get("MANTA_OUT", "/tmp/guiding3d_out")
input_uni = os.path.join(out_dir, "plume3DLowRes_%04d.uni")
output_uni = os.path.join(out_dir, "plume3DHighRes_%04d.uni")

# PD params
beta = 5
wScalar = 2
tau = 0.58 / wScalar
sigma = 2.44 / tau
theta = 0.3

flags = s2.create(FlagGrid)
vel = s2.create(MACGrid)
velT = s2.create(MACGrid)
density = s2.create(RealGrid)
pressure = s2.create(RealGrid)
W = s2.create(RealGrid)

gsLoad = vec3(res1, int(2.0 * res1), res1)
sLoader = Solver(name="loader", gridSize=gsLoad, dim=3)
velIn = sLoader.create(MACGrid)

noise = s2.create(NoiseField, loadFromFile=True)
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

source = s2.create(Cylinder, center=gs2 * vec3(0.5, 0.05, 0.5),
                   radius=res2 * 0.1, z=gs2 * vec3(0, 0.02, 0))
W.multConst(0)
W.addConst(wScalar)

numFrames = int(sys.argv[1]) if len(sys.argv) > 1 else 200
for t in range(numFrames):
    densityInflow(flags=flags, density=density, noise=noise, shape=source,
                  scale=1, sigma=0.5)

    advectSemiLagrange(flags=flags, vel=vel, grid=density, order=2)
    advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)
    resetOutflow(flags=flags, real=density)

    setWallBcs(flags=flags, vel=vel)
    addBuoyancy(density=density, vel=vel,
                gravity=vec3(0, -1e-3 * factor, 0), flags=flags)

    velIn.load(input_uni % t)
    interpolateMACGrid(source=velIn, target=velT)
    velT.multConst(vec3(factor))

    PD_fluid_guiding(vel=vel, velT=velT, flags=flags, weight=W,
                     blurRadius=beta, pressure=pressure, tau=tau,
                     sigma=sigma, theta=theta, preconditioner=PcMGStatic,
                     zeroPressureFixing=True)

    setWallBcs(flags=flags, vel=vel)
    density.save(output_uni % t)

    s2.step()

mantaMsg("guiding_3d02_high done: density max %.3f" % density.getMax())
