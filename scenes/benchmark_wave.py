"""Benchmark: FLIP rotating-tank wave driven by MEASURED experimental data.

Port of reference scenes/benchmark_wave.py:17-150 (Um/Thuerey benchmark):
a shallow pool in a tank whose rotation r(t) comes from the experimental
recording benchmark_wave_measured.npz (arrays t, r; 480 samples @ 60 Hz);
gravity is rotated by -r(t) each step.

Headless; run `python scenes/benchmark_wave.py [t_end]`.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from mantaflow_tpu import *  # noqa: E402

measured = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                'benchmark_wave_measured.npz'))


def g_tweaked(t, grav):
    r = np.interp(t, measured['t'], measured['r'])
    return vec3(-np.sin(-r) * grav, np.cos(-r) * grav, 0)


params = {}
params['dim'] = 2
params['sres'] = 2
params['dx'] = 1.0 / params['sres']
params['res'] = 10
params['len'] = 0.06
params['bnd'] = 4
params['gref'] = -9.8
params['cgaccuracy'] = 1e-3
params['gfm'] = True
params['fps'] = 30
params['t_end'] = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0

scaleToManta = float(params['res']) / params['len']
params['gs'] = [15 * params['res'] + params['bnd'] * 2,
                round(8.4 * params['res']) + params['bnd'] * 2,
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

pool_c = vec3(s.getGridSize().x * 0.5,
              0.093 * 0.5 * scaleToManta + params['bnd'],
              s.getGridSize().z * 0.5 if (params['dim'] == 3) else 0)
pool_s = vec3(s.getGridSize().x * 0.5, 0.093 * 0.5 * scaleToManta,
              s.getGridSize().z * 0.5 if (params['dim'] == 3)
              else s.getGridSize().z)
fld = s.create(Box, center=pool_c, size=pool_s)
fld.applyToGrid(grid=gFlags, value=FlagFluid, respectFlags=gFlags)

begin = pp.pySize()
sampleShapeWithParticles(shape=fld, flags=gFlags, parts=pp,
                         discretization=params['sres'], randomness=0)
end = pp.pySize()
pT.setConstRange(s=FlagFluid, begin=begin, end=end)

t0 = time.perf_counter()
nsteps = 0
while s.timeTotal < params['t_end']:
    mapPartsToMAC(vel=gV, flags=gFlags, velOld=gVold, parts=pp, partVel=pV,
                  ptype=pT, exclude=FlagEmpty)

    s.adaptTimestep(gV.getMaxAbs())

    addGravityNoScale(flags=gFlags, vel=gV,
                      gravity=g_tweaked(s.timeTotal, params['grav']))

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

dt_wall = time.perf_counter() - t0
mantaMsg("benchmark_wave: %d sim steps in %.2fs -> %.3f steps/s" %
         (nsteps, dt_wall, nsteps / dt_wall), 0)
