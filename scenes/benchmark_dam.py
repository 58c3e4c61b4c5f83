"""Benchmark: FLIP dam break with obstacle (Kleefsman et al. setup).

Port of reference scenes/benchmark_dam.py:18-150 (Um/Thuerey benchmark):
real-world-scaled dam with a box obstacle, adaptive CFL=1 timestep,
ghost-fluid pressure solve, Lagrangian treatment of stray particles.

Headless: guion off; run `python scenes/benchmark_dam.py [res] [t_end]`.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from mantaflow_tpu import *  # noqa: E402

guion = False

params = {}
params['dim'] = 3
params['sres'] = 2
params['dx'] = 1.0 / params['sres']
params['res'] = int(sys.argv[1]) if len(sys.argv) > 1 else 25
params['len'] = 1.0
params['bnd'] = 4
params['gref'] = -9.8
params['cgaccuracy'] = 1e-3
params['jitter'] = 0.5
params['gfm'] = True
params['fps'] = 30
params['t_end'] = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
params['sdt'] = None

scaleToManta = float(params['res']) / params['len']
params['gs'] = [round(float(params['res']) * 3.2) + params['bnd'] * 2,
                params['res'] * 3 + params['bnd'] * 2,
                params['res'] + params['bnd'] * 2
                if params['dim'] == 3 else 1]
params['grav'] = params['gref'] * scaleToManta

s = Solver(name="FLIP", gridSize=vec3(params['gs'][0], params['gs'][1],
                                      params['gs'][2]), dim=params['dim'])
s.cfl = 1
s.frameLength = 1.0 / float(params['fps'])
s.timestepMin = 0
s.timestepMax = s.frameLength
s.timestep = s.frameLength

gFlags = s.create(FlagGrid)
gV = s.create(MACGrid)
gVold = s.create(MACGrid)
gP = s.create(RealGrid)
gPhiSld = s.create(LevelsetGrid)

pp = s.create(BasicParticleSystem)
pT = pp.create(PdataInt)
pV = pp.create(PdataVec3)
pVtmp = pp.create(PdataVec3)

paramSolvePressure = dict(flags=gFlags, vel=gV, pressure=gP,
                          cgAccuracy=params['cgaccuracy'])
if params['gfm']:
    gPhi = s.create(LevelsetGrid)
    gIdxSys = s.create(ParticleIndexSystem)
    gIdx = s.create(IntGrid)
    paramSolvePressure.update(phi=gPhi)

gFlags.initDomain(params['bnd'] - 1)
bndBox = s.create(Box, p0=vec3(0),
                  p1=vec3(params['gs'][0], params['gs'][1], params['gs'][2]))
inBox = s.create(Box, p0=vec3(params['bnd'], params['bnd'],
                              params['bnd'] if params['dim'] == 3 else 0),
                 p1=vec3(params['gs'][0] - params['bnd'],
                         params['gs'][1] - params['bnd'],
                         (params['gs'][0] - params['bnd'])
                         if params['dim'] == 3 else 1))
gPhiSld.join(bndBox.computeLevelset())
gPhiSld.subtract(inBox.computeLevelset())

# obstacle
a = vec3(0.744 * scaleToManta + params['bnd'],
         0.161 * 0.5 * scaleToManta + params['bnd'],
         0.5 * params['gs'][2] if (params['dim'] == 3) else 0)
b = vec3(0.161 * 0.5 * scaleToManta, 0.161 * 0.5 * scaleToManta,
         0.403 * 0.5 * scaleToManta if (params['dim'] == 3)
         else params['gs'][2])
obs = s.create(Box, center=a, size=b)
obs.applyToGrid(grid=gFlags, value=FlagObstacle, respectFlags=gFlags)
gPhiSld.join(obs.computeLevelset())

# fluid dam
dam_c = [2.606, 0.275, 0.5]
dam_s = [1.228 * 0.5, 0.55 * 0.5, 0.5]
a = vec3(dam_c[0] * scaleToManta + params['bnd'],
         dam_c[1] * scaleToManta + params['bnd'],
         dam_c[2] * scaleToManta + params['bnd']
         if (params['dim'] == 3) else 0)
b = vec3(dam_s[0] * scaleToManta, dam_s[1] * scaleToManta,
         dam_s[2] * scaleToManta if (params['dim'] == 3)
         else params['gs'][2])
fld = s.create(Box, center=a, size=b)
fld.applyToGrid(grid=gFlags, value=FlagFluid, respectFlags=gFlags)

begin = pp.pySize()
sampleShapeWithParticles(shape=fld, flags=gFlags, parts=pp,
                         discretization=params['sres'], randomness=0)
end = pp.pySize()
pT.setConstRange(s=FlagFluid, begin=begin, end=end)

if guion:
    gui = Gui()
    gui.show()

t0 = time.perf_counter()
nsteps = 0
while s.timeTotal < params['t_end']:
    mapPartsToMAC(vel=gV, flags=gFlags, velOld=gVold, parts=pp, partVel=pV,
                  ptype=pT, exclude=FlagEmpty)

    s.adaptTimestep(gV.getMaxAbs())

    addGravityNoScale(flags=gFlags, vel=gV,
                      gravity=vec3(0, params['grav'], 0))

    if params['gfm']:
        gridParticleIndex(parts=pp, flags=gFlags, indexSys=gIdxSys,
                          index=gIdx)
        unionParticleLevelset(parts=pp, indexSys=gIdxSys, flags=gFlags,
                              index=gIdx, phi=gPhi, radiusFactor=1.0)
        extrapolateLsSimple(phi=gPhi, distance=4, inside=True)

    setWallBcs(flags=gFlags, vel=gV)
    solvePressure(**paramSolvePressure)
    setWallBcs(flags=gFlags, vel=gV)
    extrapolateMACSimple(flags=gFlags, vel=gV)

    flipVelocityUpdate(vel=gV, velOld=gVold, flags=gFlags, parts=pp,
                       partVel=pV, flipRatio=0.97, ptype=pT,
                       exclude=FlagEmpty)
    addForcePvel(vel=pV, a=vec3(0, params['grav'], 0), dt=s.timestep,
                 ptype=pT, exclude=FlagFluid)

    pp.getPosPdata(target=pVtmp)
    pp.advectInGrid(flags=gFlags, vel=gV, integrationMode=IntRK4,
                    deleteInObstacle=False, ptype=pT, exclude=FlagEmpty)
    eulerStep(parts=pp, vel=pV, ptype=pT, exclude=FlagFluid)
    pp.projectOutOfBnd(flags=gFlags, bnd=params['bnd'] + params['dx'] * 0.5,
                       plane='xXyYzZ', ptype=pT)
    pushOutofObs(parts=pp, flags=gFlags, phiObs=gPhiSld,
                 thresh=params['dx'] * 0.5, ptype=pT)

    updateVelocityFromDeltaPos(parts=pp, vel=pV, x_prev=pVtmp,
                               dt=s.timestep, ptype=pT, exclude=FlagFluid)

    markFluidCells(parts=pp, flags=gFlags, ptype=pT)
    setPartType(parts=pp, ptype=pT, mark=FlagFluid, stype=FlagEmpty,
                flags=gFlags, cflag=FlagFluid)
    markIsolatedFluidCell(flags=gFlags, mark=FlagEmpty)
    setPartType(parts=pp, ptype=pT, mark=FlagEmpty, stype=FlagFluid,
                flags=gFlags, cflag=FlagEmpty)

    s.step()
    nsteps += 1
    if s.frame != getattr(s, "_last_printed_frame", -1):
        s._last_printed_frame = s.frame
        mantaMsg("frame %d t=%.3f steps=%d parts=%d" %
                 (s.frame, s.timeTotal, nsteps, pp.pySize()), 0)

dt_wall = time.perf_counter() - t0
mantaMsg("benchmark_dam: %d sim steps in %.2fs -> %.3f steps/s" %
         (nsteps, dt_wall, nsteps / dt_wall), 0)
