"""k-epsilon turbulence modeling (RANS) with synthesized turbulence
particles past a sphere array.

Port of reference scenes/turbulence.py (GUI sliders replaced by the fixed
defaults they initialize to).

Headless: `python scenes/turbulence.py [frames]` (default 60).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from mantaflow_tpu import *  # noqa: E402

res = 64
gs = vec3(res, res / 2, res / 2)
s = Solver(name='main', gridSize=gs)
s.timestep = 0.5
timings = Timings()

velInflow = vec3(0.52, 0, 0)

flags = s.create(FlagGrid)
pressure = s.create(RealGrid)
vel = s.create(MACGrid)

k = s.create(RealGrid)
eps = s.create(RealGrid)
prod = s.create(RealGrid)
nuT = s.create(RealGrid)
strain = s.create(RealGrid)

noise = s.create(NoiseField)
noise.timeAnim = 0

turb = s.create(TurbulenceParticleSystem, noise=noise)

flags.initDomain()
flags.fillGrid()

for i in range(4):
    for j in range(4):
        obs = Sphere(parent=s,
                     center=gs * vec3(0.2, (i + 1) / 5.0, (j + 1) / 5.0),
                     radius=res * 0.025)
        obs.applyToGrid(grid=flags, value=FlagObstacle)

sdf = obstacleLevelset(flags)
bgr = s.create(Mesh)
sdf.createMesh(bgr)

box = Box(parent=s, center=gs * vec3(0.05, 0.43, 0.6),
          size=gs * vec3(0.02, 0.005, 0.07))

L0 = 0.01
mult = 0.1
intensity = 0.1
nu = 0.1
prodMult = 2.5
enableDiffuse = True

if GUI:
    gui = Gui()
    gui.show()

KEpsilonBcs(flags=flags, k=k, eps=eps, intensity=intensity, nu=nu,
            fillArea=True)

frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60
for t in range(frames):
    turb.seed(box, 500)
    turb.advectInGrid(flags=flags, vel=vel, integrationMode=IntRK4)
    turb.synthesize(flags=flags, octaves=1, k=k, switchLength=5, L0=L0,
                    scale=mult, inflowBias=velInflow)
    turb.deleteInObstacle(flags)

    KEpsilonBcs(flags=flags, k=k, eps=eps, intensity=intensity, nu=nu,
                fillArea=False)
    advectSemiLagrange(flags=flags, vel=vel, grid=k, order=1)
    advectSemiLagrange(flags=flags, vel=vel, grid=eps, order=1)
    KEpsilonBcs(flags=flags, k=k, eps=eps, intensity=intensity, nu=nu,
                fillArea=False)
    KEpsilonComputeProduction(vel=vel, k=k, eps=eps, prod=prod, nuT=nuT,
                              strain=strain, pscale=prodMult)
    KEpsilonSources(k=k, eps=eps, prod=prod)

    if enableDiffuse:
        KEpsilonGradientDiffusion(k=k, eps=eps, vel=vel, nuT=nuT,
                                  sigmaU=10.0)

    advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)
    setWallBcs(flags=flags, vel=vel)
    setInflowBcs(vel=vel, dir='xXyYzZ', value=velInflow)
    solvePressure(flags=flags, vel=vel, pressure=pressure, cgMaxIterFac=0.5)
    setWallBcs(flags=flags, vel=vel)
    setInflowBcs(vel=vel, dir='xXyYzZ', value=velInflow)
    s.step()
    if t % 20 == 19:
        mantaMsg("frame %d k max %.4f turb parts %d" %
                 (t + 1, k.getMax(), turb.pySize()), 0)

mantaMsg("turbulence: done", 0)
