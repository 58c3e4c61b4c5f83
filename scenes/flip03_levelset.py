# FLIP liquid with particle levelset and ghost-fluid surface (flip02/03
# pattern). Run: PYTHONPATH=. python scenes/flip03_levelset.py
import os

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))
from mantaflow_tpu import *

dim, res = 3, 48
gs = vec3(res, res, res)
s = Solver(name="main", gridSize=gs, dim=dim)
s.timestep = 0.8
minParticles = pow(2, dim)

flags = s.create(FlagGrid)
phi = s.create(LevelsetGrid)
phiParts = s.create(LevelsetGrid)
vel = s.create(MACGrid)
velOld = s.create(MACGrid)
pressure = s.create(RealGrid)
tmpVec3 = s.create(VecGrid)
pp = s.create(BasicParticleSystem)
pVel = pp.create(PdataVec3)
pindex = s.create(ParticleIndexSystem)
gpi = s.create(IntGrid)
mesh = s.create(Mesh)

flags.initDomain(boundaryWidth=0)
fluidbox = Box(s, p0=gs * vec3(0, 0, 0), p1=gs * vec3(0.4, 0.6, 1))
phi.setConst(1e10)
phi.join(fluidbox.computeLevelset())
flags.updateFromLevelset(phi)
sampleLevelsetWithParticles(phi=phi, flags=flags, parts=pp,
                            discretization=2, randomness=0.1)

for t in range(120):
    mantaMsg("\nFrame %i, t %f" % (s.frame, s.timeTotal))
    pp.advectInGrid(flags=flags, vel=vel, integrationMode=IntRK4,
                    deleteInObstacle=False)
    mapPartsToMAC(vel=vel, flags=flags, velOld=velOld, parts=pp,
                  partVel=pVel, weight=tmpVec3)
    extrapolateMACFromWeight(vel=vel, distance=2, weight=tmpVec3)
    markFluidCells(parts=pp, flags=flags)
    gridParticleIndex(parts=pp, flags=flags, indexSys=pindex, index=gpi)
    unionParticleLevelset(pp, pindex, flags, gpi, phiParts)
    phi.copyFrom(phiParts)
    extrapolateLsSimple(phi=phi, distance=4, inside=True)
    addGravity(flags=flags, vel=vel, gravity=vec3(0, -0.003, 0))
    setWallBcs(flags=flags, vel=vel)
    solvePressure(flags=flags, vel=vel, pressure=pressure, phi=phi)
    setWallBcs(flags=flags, vel=vel)
    extrapolateMACSimple(flags=flags, vel=vel)
    flipVelocityUpdate(vel=vel, velOld=velOld, flags=flags, parts=pp,
                       partVel=pVel, flipRatio=0.97)
    pVel.setSource(vel, isMAC=True)
    adjustNumber(parts=pp, vel=vel, flags=flags, minParticles=minParticles,
                 maxParticles=2 * minParticles, phi=phi)
    s.step()
    if s.frame % 20 == 0:
        phi.createMesh(mesh)
        out = os.environ.get("MANTA_OUT", "/tmp/flip03_out")
        os.makedirs(out, exist_ok=True)
        mesh.save(os.path.join(out, "flip_surface_%04d.bobj.gz") % s.frame)
