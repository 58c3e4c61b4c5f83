"""FLIP with level set, particle resampling and per-frame surface meshes.
Port of reference scenes/flip02_surface.py:1-143 onto the mantaflow_tpu
scene API (falling-drop setup, adjustNumber resampling, createMesh).

Run: PYTHONPATH=. python scenes/flip02_surface.py [frames]"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

from mantaflow_tpu import *

out = os.environ.get("MANTA_OUT", "/tmp/flip02_out/")
os.makedirs(out, exist_ok=True)

dim = 3
res = 48
gs = vec3(res, res, res)
s = Solver(name="main", gridSize=gs, dim=dim)
s.timestep = 0.8
minParticles = pow(2, dim)

saveParts = os.environ.get("MANTA_SAVE_PARTS", "0") == "1"
radiusFactor = 1.0

flags = s.create(FlagGrid)
phi = s.create(LevelsetGrid)
vel = s.create(MACGrid)
velOld = s.create(MACGrid)
pressure = s.create(RealGrid)
tmpVec3 = s.create(VecGrid)
tstGrid = s.create(RealGrid)

pp = s.create(BasicParticleSystem)
pVel = pp.create(PdataVec3)
pTest = pp.create(PdataReal)
mesh = s.create(Mesh)

pindex = s.create(ParticleIndexSystem)
gpi = s.create(IntGrid)

bWidth = 1
flags.initDomain(boundaryWidth=bWidth)

# falling drop into a basin (reference setup==1)
fluidBasin = Box(s, p0=gs * vec3(0, 0, 0), p1=gs * vec3(1.0, 0.1, 1.0))
dropCenter = vec3(0.5, 0.3, 0.5)
dropRadius = 0.1
fluidDrop = Sphere(s, center=gs * dropCenter, radius=res * dropRadius)
fluidVel = Sphere(s, center=gs * dropCenter, radius=res * (dropRadius + 0.05))
fluidSetVel = vec3(0, -1, 0)
phi.copyFrom(fluidBasin.computeLevelset())
phi.join(fluidDrop.computeLevelset())

flags.updateFromLevelset(phi)
sampleLevelsetWithParticles(phi=phi, flags=flags, parts=pp,
                            discretization=2, randomness=0.05)

fluidVel.applyToGrid(grid=vel, value=fluidSetVel)
mapGridToPartsVec3(source=vel, parts=pp, target=pVel)

testInitGridWithPos(tstGrid)
pTest.setConst(0.1)

if saveParts:
    pressure.save(out + "ref_parts_0000.uni")

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 20
for t in range(n_frames):
    mantaMsg("\nFrame %i, simulation time %f" % (s.frame, s.timeTotal))

    pp.advectInGrid(flags=flags, vel=vel, integrationMode=IntRK4,
                    deleteInObstacle=False)

    mapPartsToMAC(vel=vel, flags=flags, velOld=velOld, parts=pp,
                  partVel=pVel, weight=tmpVec3)
    extrapolateMACFromWeight(vel=vel, distance=2, weight=tmpVec3)
    markFluidCells(parts=pp, flags=flags)

    gridParticleIndex(parts=pp, flags=flags, indexSys=pindex, index=gpi)
    unionParticleLevelset(pp, pindex, flags, gpi, phi, radiusFactor)
    resetOutflow(flags=flags, parts=pp, index=gpi, indexSys=pindex)
    extrapolateLsSimple(phi=phi, distance=4, inside=True)

    addGravity(flags=flags, vel=vel, gravity=(0, -0.001, 0))
    setWallBcs(flags=flags, vel=vel)
    solvePressure(flags=flags, vel=vel, pressure=pressure, phi=phi)
    setWallBcs(flags=flags, vel=vel)

    pVel.setSource(vel, isMAC=True)
    pTest.setSource(tstGrid)
    adjustNumber(parts=pp, vel=vel, flags=flags,
                 minParticles=1 * minParticles,
                 maxParticles=2 * minParticles, phi=phi,
                 radiusFactor=radiusFactor)

    extrapolateMACSimple(flags=flags, vel=vel)

    flipVelocityUpdate(vel=vel, velOld=velOld, flags=flags, parts=pp,
                       partVel=pVel, flipRatio=0.97)

    if dim == 3:
        phi.createMesh(mesh)

    s.step()

    if saveParts:
        pp.save(out + "parts_%04d.uni" % t)
        mesh.save(out + "surface_%04d.bobj.gz" % t)

mantaMsg("flip02 done: %d particles, %d mesh tris"
         % (pp.pySize(), mesh.numTris()))
