"""Very simple APIC without level set or resampling.
Port of reference scenes/apic01_simple.py:1-78.

Run: PYTHONPATH=. python scenes/apic01_simple.py [frames]"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from mantaflow_tpu import *

dim = 2
particleNumber = 2
res = 64
gs = vec3(res, res, res)
if dim == 2:
    gs = vec3(res, res, 1)
    particleNumber = 3

s = Solver(name="main", gridSize=gs, dim=dim)
s.timestep = 0.5

flags = s.create(FlagGrid)
vel = s.create(MACGrid)
velOld = s.create(MACGrid)
pressure = s.create(RealGrid)
tmpVec3 = s.create(VecGrid)
pp = s.create(BasicParticleSystem)
pVel = pp.create(PdataVec3)
mass = s.create(MACGrid)
pCx = pp.create(PdataVec3)
pCy = pp.create(PdataVec3)
pCz = pp.create(PdataVec3)

flags.initDomain(boundaryWidth=0)
fluidbox = Box(s, p0=gs * vec3(0, 0, 0), p1=gs * vec3(0.4, 0.6, 1))
phiInit = fluidbox.computeLevelset()
flags.updateFromLevelset(phiInit)

sampleFlagsWithParticles(flags=flags, parts=pp,
                         discretization=particleNumber, randomness=0.2)

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
for t in range(n_frames):
    mantaMsg("\nFrame %i, simulation time %f" % (s.frame, s.timeTotal))

    pp.advectInGrid(flags=flags, vel=vel, integrationMode=IntRK4,
                    deleteInObstacle=False)
    apicMapPartsToMAC(flags=flags, vel=vel, parts=pp, partVel=pVel,
                      cpx=pCx, cpy=pCy, cpz=pCz, mass=mass)
    extrapolateMACFromWeight(vel=vel, distance=2, weight=tmpVec3)
    markFluidCells(parts=pp, flags=flags)

    addGravity(flags=flags, vel=vel, gravity=(0, -0.002, 0))

    setWallBcs(flags=flags, vel=vel)
    solvePressure(flags=flags, vel=vel, pressure=pressure)
    setWallBcs(flags=flags, vel=vel)

    extrapolateMACSimple(flags=flags, vel=vel)

    apicMapMACGridToParts(partVel=pVel, cpx=pCx, cpy=pCy, cpz=pCz,
                          parts=pp, vel=vel, flags=flags)
    s.step()

mantaMsg("apic01 done: %d particles, velmax %.4f"
         % (pp.pySize(), vel.getMaxAbs()))
