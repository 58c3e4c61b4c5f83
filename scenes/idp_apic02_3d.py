"""3D dam break with APIC + the implicit density projection position solver
(Kugelstadt et al. — the zl fork's IDP pipeline).
Port of reference scenes/idp_apic02_3d.py:1-126.

Run: PYTHONPATH=. python scenes/idp_apic02_3d.py [frames] [res]"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from mantaflow_tpu import *

dim = 3
particleNumber = 2
res = int(sys.argv[2]) if len(sys.argv) > 2 else 48
gs = vec3(res, res, res)

s = Solver(name="main", gridSize=gs, dim=dim)
s.timestep = 1.0

flags = s.create(FlagGrid)
vel = s.create(MACGrid)
velOld = s.create(MACGrid)
pressure = s.create(RealGrid)
tmpVec3 = s.create(VecGrid)
pp = s.create(BasicParticleSystem)
pVel = pp.create(PdataVec3)
phiObs = s.create(LevelsetGrid, name="phiObs")
apic_mass = s.create(MACGrid)
apic_pCx = pp.create(PdataVec3)
apic_pCy = pp.create(PdataVec3)
apic_pCz = pp.create(PdataVec3)

usePositionSolver = True
density = s.create(RealGrid)
Lambda = s.create(RealGrid)
deltaX = s.create(MACGrid)
flagsPos = s.create(FlagGrid)
pMass = pp.create(PdataReal)
mass = 1.0 / (particleNumber ** 3)

s.timestep = 1
s.frameLength = 10000000.0
s.timestepMin = 0.01
s.timestepMax = 1.0
s.cfl = 5.0

flags.initDomain(boundaryWidth=1)
fluidbox = Box(s, p0=gs * vec3(0, 0, 0.25), p1=gs * vec3(0.5, 0.35, 0.75))
phiInit = fluidbox.computeLevelset()
flags.updateFromLevelset(phiInit)

sampleFlagsWithParticles(flags=flags, parts=pp,
                         discretization=particleNumber, randomness=0.5)
copyFlagsToFlags(flags, flagsPos)
flags.initDomain(boundaryWidth=1, phiWalls=phiObs)

adaptiveTimeSteps = True

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
for t in range(n_frames):
    if adaptiveTimeSteps:
        maxVel = vel.getMax()
        s.adaptTimestep(maxVel)

    mantaMsg("\nFrame %i, simulation time %f" % (s.frame, s.timeTotal))

    pp.advectInGrid(flags=flags, vel=vel, integrationMode=2,
                    deleteInObstacle=False, stopInObstacle=False)

    if usePositionSolver:
        copyFlagsToFlags(flags, flagsPos)
        mapMassToGrid(flags=flagsPos, density=density, parts=pp,
                      source=pMass, deltaX=deltaX, phiObs=phiObs,
                      dt=s.timestep, particleMass=mass,
                      noDensityClamping=False)

        solvePressureSystem(rhs=density, vel=vel, pressure=Lambda,
                            flags=flagsPos, cgAccuracy=1e-3)
        computeDeltaX(deltaX=deltaX, Lambda=Lambda, flags=flagsPos)
        mapMACToPartPositions(flags=flagsPos, deltaX=deltaX, parts=pp,
                              dt=s.timestep)

    apicMapPartsToMAC(flags=flags, vel=vel, parts=pp, partVel=pVel,
                      cpx=apic_pCx, cpy=apic_pCy, cpz=apic_pCz,
                      mass=apic_mass)
    extrapolateMACFromWeight(vel=vel, distance=2, weight=tmpVec3)
    markFluidCells(parts=pp, flags=flags)

    addGravityNoScale(flags=flags, vel=vel, gravity=(0, -0.01, 0))

    setWallBcs(flags=flags, vel=vel)
    solvePressure(flags=flags, vel=vel, pressure=pressure, cgAccuracy=1e-3)
    setWallBcs(flags=flags, vel=vel)

    extrapolateMACSimple(flags=flags, vel=vel, distance=5)

    apicMapMACGridToParts(partVel=pVel, cpx=apic_pCx, cpy=apic_pCy,
                          cpz=apic_pCz, parts=pp, vel=vel, flags=flags)

    s.step()

mantaMsg("idp_apic02 done: %d particles, velmax %.4f"
         % (pp.pySize(), vel.getMaxAbs()))
