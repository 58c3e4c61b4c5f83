"""2D dam break with APIC + implicit density projection (Kugelstadt'19).

Port of reference scenes/idp_apic01_simple.py: APIC transfers with the
position solver (mass-to-grid, density-pressure solve, deltaX push-back)
and overfull-cell resampling.

Headless: `python scenes/idp_apic01_simple.py [frames]` (default 60).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from mantaflow_tpu import *  # noqa: E402

dim = 2
particleNumber = 3
res = 64
gs = vec3(res, res, 1)

s = Solver(name='main', gridSize=gs, dim=dim)
s.timestep = 1.0

flags = s.create(FlagGrid)
vel = s.create(MACGrid)
pressure = s.create(RealGrid)
tmpVec3 = s.create(VecGrid)
pp = s.create(BasicParticleSystem)
pVel = pp.create(PdataVec3)
phiObs = s.create(LevelsetGrid, name='phiObs')
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
mass = 1.0 / (particleNumber * particleNumber)

resampleParticles = True
if resampleParticles:
    pindex = s.create(ParticleIndexSystem)
    gpi = s.create(IntGrid)
    gCnt = s.create(IntGrid)

flags.initDomain(boundaryWidth=1)
fluidbox = Box(parent=s, p0=gs * vec3(0, 0, 0), p1=gs * vec3(0.4, 0.6, 1))
phiInit = fluidbox.computeLevelset()
flags.updateFromLevelset(phiInit)

sampleFlagsWithParticles(flags=flags, parts=pp,
                         discretization=particleNumber, randomness=0.5)
copyFlagsToFlags(flags, flagsPos)
flags.initDomain(boundaryWidth=1, phiWalls=phiObs)

if GUI:
    gui = Gui()
    gui.show()

frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60
for t in range(frames):
    pp.advectInGrid(flags=flags, vel=vel, integrationMode=2,
                    deleteInObstacle=False, stopInObstacle=False)

    if usePositionSolver:
        copyFlagsToFlags(flags, flagsPos)
        mapMassToGrid(flags=flagsPos, density=density, parts=pp,
                      source=pMass, deltaX=deltaX, phiObs=phiObs,
                      dt=s.timestep, particleMass=mass,
                      noDensityClamping=resampleParticles)

        if resampleParticles:
            gridParticleIndex(parts=pp, indexSys=pindex, flags=flags,
                              index=gpi, counter=gCnt)
            apicMapPartsToMAC(flags=flags, vel=vel, parts=pp, partVel=pVel,
                              cpx=apic_pCx, cpy=apic_pCy, cpz=apic_pCz,
                              mass=apic_mass)
            resampeOverfullCells(vel=vel, density=density, index=gpi,
                                 indexSys=pindex, part=pp, pVel=pVel,
                                 dt=s.timestep)

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

    addGravityNoScale(flags=flags, vel=vel, gravity=(0, -0.002, 0))

    setWallBcs(flags=flags, vel=vel)
    solvePressure(flags=flags, vel=vel, pressure=pressure, cgAccuracy=1e-3)
    setWallBcs(flags=flags, vel=vel)

    extrapolateMACSimple(flags=flags, vel=vel, distance=5)

    apicMapMACGridToParts(partVel=pVel, cpx=apic_pCx, cpy=apic_pCy,
                          cpz=apic_pCz, parts=pp, vel=vel, flags=flags)
    s.step()
    if t % 20 == 19:
        mantaMsg("frame %d parts %d" % (t + 1, pp.pySize()), 0)

mantaMsg("idp_apic01: done", 0)
