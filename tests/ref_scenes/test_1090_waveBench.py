"""Rotating-tank wave benchmark (Um/Thuerey) vs reference-binary goldens.

Compact replay of reference scenes/benchmark_wave.py:26-143 at t_end=1.0
(2D 158x92, measured tank-rotation data driving time-varying gravity);
goldens dumped by the reference binary at the same sim time.
"""
import os

import numpy as np

from mantaflow_tpu import *


def scene(dtg):
    measured = np.load(os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "scenes",
        "benchmark_wave_measured.npz"))

    def g_tweaked(t, grav):
        r = np.interp(t, measured['t'], measured['r'])
        return vec3(-np.sin(-r) * grav, np.cos(-r) * grav, 0)

    dim, sres, res, length, bnd = 2, 2, 10, 0.06, 4
    dx = 1.0 / sres
    gref, cgaccuracy, fps, t_end = -9.8, 1e-3, 30, 1.0
    scaleToManta = float(res) / length
    gs = [15 * res + bnd * 2, round(8.4 * res) + bnd * 2, 1]
    grav = gref * scaleToManta

    s = Solver(name="FLIP", gridSize=vec3(gs[0], gs[1], gs[2]), dim=dim)
    s.cfl = 1
    s.frameLength = 1.0 / float(fps)
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

    gPhi = s.create(LevelsetGrid)
    gIdxSys = s.create(ParticleIndexSystem)
    gIdx = s.create(IntGrid)

    gFlags.initDomain(bnd - 1)
    bndBox = s.create(Box, p0=vec3(0), p1=vec3(gs[0], gs[1], gs[2]))
    inBox = s.create(Box, p0=vec3(bnd, bnd, 0),
                     p1=vec3(gs[0] - bnd, gs[1] - bnd, 1))
    gPhiSld.join(bndBox.computeLevelset())
    gPhiSld.subtract(inBox.computeLevelset())

    pool_c = vec3(s.getGridSize().x * 0.5,
                  0.093 * 0.5 * scaleToManta + bnd, 0)
    pool_s = vec3(s.getGridSize().x * 0.5, 0.093 * 0.5 * scaleToManta,
                  s.getGridSize().z)
    fld = s.create(Box, center=pool_c, size=pool_s)
    fld.applyToGrid(grid=gFlags, value=FlagFluid, respectFlags=gFlags)

    begin = pp.pySize()
    sampleShapeWithParticles(shape=fld, flags=gFlags, parts=pp,
                             discretization=sres, randomness=0)
    end = pp.pySize()
    pT.setConstRange(s=FlagFluid, begin=begin, end=end)

    while s.timeTotal < t_end:
        mapPartsToMAC(vel=gV, flags=gFlags, velOld=gVold, parts=pp,
                      partVel=pV, ptype=pT, exclude=FlagEmpty)
        s.adaptTimestep(gV.getMaxAbs())
        addGravityNoScale(flags=gFlags, vel=gV,
                          gravity=g_tweaked(s.timeTotal, grav))

        gridParticleIndex(parts=pp, flags=gFlags, indexSys=gIdxSys,
                          index=gIdx)
        unionParticleLevelset(parts=pp, indexSys=gIdxSys, flags=gFlags,
                              index=gIdx, phi=gPhi, radiusFactor=1.0)
        extrapolateLsSimple(phi=gPhi, distance=4, inside=True)

        setWallBcs(flags=gFlags, vel=gV)
        solvePressure(flags=gFlags, vel=gV, pressure=gP,
                      cgAccuracy=cgaccuracy, phi=gPhi)
        setWallBcs(flags=gFlags, vel=gV)
        extrapolateMACSimple(flags=gFlags, vel=gV)

        flipVelocityUpdate(vel=gV, velOld=gVold, flags=gFlags, parts=pp,
                           partVel=pV, flipRatio=0.97, ptype=pT,
                           exclude=FlagEmpty)
        addForcePvel(vel=pV, a=vec3(0, grav, 0), dt=s.timestep, ptype=pT,
                     exclude=FlagFluid)

        pp.getPosPdata(target=pVtmp)
        pp.advectInGrid(flags=gFlags, vel=gV, integrationMode=IntRK4,
                        deleteInObstacle=False, ptype=pT, exclude=FlagEmpty)
        eulerStep(parts=pp, vel=pV, ptype=pT, exclude=FlagFluid)
        pp.projectOutOfBnd(flags=gFlags, bnd=bnd + dx * 0.5,
                           plane='xXyYzZ', ptype=pT)
        pushOutofObs(parts=pp, flags=gFlags, phiObs=gPhiSld,
                     thresh=dx * 0.5, ptype=pT)
        updateVelocityFromDeltaPos(parts=pp, vel=pV, x_prev=pVtmp,
                                   dt=s.timestep, ptype=pT,
                                   exclude=FlagFluid)

        markFluidCells(parts=pp, flags=gFlags, ptype=pT)
        setPartType(parts=pp, ptype=pT, mark=FlagFluid, stype=FlagEmpty,
                    flags=gFlags, cflag=FlagFluid)
        markIsolatedFluidCell(flags=gFlags, mark=FlagEmpty)
        setPartType(parts=pp, ptype=pT, mark=FlagEmpty, stype=FlagFluid,
                    flags=gFlags, cflag=FlagEmpty)
        s.step()

    # measured diffs after the 30 frames: phi 7.1e-4, vel 1.5e-2
    dtg("phi", gPhi, 0.005)
    dtg("vel", gV, 0.05)
