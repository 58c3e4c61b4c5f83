"""NPZ file-format round-trip inside an APIC sim.
Port of reference scenes/numpy_write_read.py:1-120 (per-frame save/load of
Real, MAC and Int grids as .npz, with sub-diff checks).

Run: PYTHONPATH=. python scenes/numpy_write_read.py [frames]"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from mantaflow_tpu import *

dim = 2
particleNumber = 3
res = 64
gs = vec3(res, res, 1)

s = Solver(name="main", gridSize=gs, dim=dim)
s.timestep = 0.5

flags = s.create(FlagGrid)
flags2 = s.create(FlagGrid)
vel = s.create(MACGrid)
vel2 = s.create(MACGrid)
pressure = s.create(RealGrid)
pressure2 = s.create(RealGrid)
tmpVec3 = s.create(VecGrid)
pp = s.create(BasicParticleSystem)
pVel = pp.create(PdataVec3)
mass = s.create(MACGrid)
pCx = pp.create(PdataVec3)
pCy = pp.create(PdataVec3)
pCz = pp.create(PdataVec3)

flags.initDomain(boundaryWidth=0)
fluidbox = Box(s, p0=gs * vec3(0, 0, 0), p1=gs * vec3(0.4, 0.6, 1))
flags.updateFromLevelset(fluidbox.computeLevelset())
sampleFlagsWithParticles(flags=flags, parts=pp,
                         discretization=particleNumber, randomness=0.2)

out = tempfile.mkdtemp(prefix="manta_npz_")
n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 10
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

    pressure.save(os.path.join(out, "pressure_TEST.npz"))
    pressure2.load(os.path.join(out, "pressure_TEST.npz"))
    mantaMsg("\nTesting Real Grid numpy write/read")
    mantaMsg("Min/Max Orig: %f %f" % (pressure.getMin(), pressure.getMax()))
    mantaMsg("Min/Max New: %f %f" % (pressure2.getMin(), pressure2.getMax()))
    pressure2.sub(pressure)
    assert pressure2.getMaxAbs() == 0.0

    vel.save(os.path.join(out, "velocity_TEST.npz"))
    vel2.load(os.path.join(out, "velocity_TEST.npz"))
    mantaMsg("\nTesting MAC Grid numpy write/read")
    vel2.sub(vel)
    assert vel2.getMaxAbs() == 0.0

    flags.save(os.path.join(out, "flags_TEST.npz"))
    flags2.load(os.path.join(out, "flags_TEST.npz"))
    mantaMsg("\nTesting Int Grid numpy write/read")
    assert (flags2.to_numpy() == flags.to_numpy()).all()

mantaMsg("numpy_write_read done (npz round-trips exact)")
