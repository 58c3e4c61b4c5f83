"""zoharl3-fork zflip: volume-preserving FLIP dam, method-switchable.

Port of the runnable core of reference scenes/zflip.py (the 1456-line
original drives moving obstacles, meshing and Windows-only logging; the
methods themselves are this loop) driven like scenes/run.py:

    python scenes/zflip.py [method] [frames] [res]

with method 0=FLIP, 1=FIXED_VOL, 2=CORRECT19 (run.py:10-13). The fork
does not ship the FIXED_VOL plugin (see PARITY.md §2.14); ours is the
designed redistribution in mantaflow_tpu/scene/zflip_api.py. Prints the
per-frame occupied fluid volume so the methods' volume drift can be
compared (FLIP drifts, CORRECT19 reduces it, FIXED_VOL pins it).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from mantaflow_tpu import *  # noqa: E402
import numpy as np  # noqa: E402

FLIP, FIXED_VOL, CORRECT19 = 0, 1, 2


def run_zflip(method=FIXED_VOL, frames=40, res=32, dim=3, verbose=True):
    part_per_cell_1d = 2
    ppc = part_per_cell_1d ** dim
    gs = vec3(res, res, 1 if dim == 2 else res)
    s = Solver(name='main', gridSize=gs, dim=dim)
    s.timestep = 0.5
    gravity = -0.02

    flags = s.create(FlagGrid)
    phi = s.create(LevelsetGrid)
    phiParts = s.create(LevelsetGrid)
    vel = s.create(MACGrid)
    velOld = s.create(MACGrid)
    pressure = s.create(RealGrid)
    mapWeights = s.create(MACGrid)
    phiObs = s.create(LevelsetGrid)

    pp = s.create(BasicParticleSystem)
    pVel = pp.create(PdataVec3)
    pindex = s.create(ParticleIndexSystem)
    gpi = s.create(IntGrid)

    flags.initDomain(boundaryWidth=0)
    dam = s.create(Box, p0=gs * vec3(0, 0, 0),
                   p1=gs * vec3(0.4, 0.6, 1.0))
    phi.copyFrom(dam.computeLevelset())
    flags.updateFromLevelset(phi)
    phiObs.setConst(999.)

    sampleLevelsetWithParticles(phi=phi, flags=flags, parts=pp,
                                discretization=part_per_cell_1d,
                                randomness=0.1)

    correct19 = None
    if method == CORRECT19:
        correct19 = Correct19(dim, s, part_per_cell_1d, pp)

    n0 = pp.pySize()
    vol0 = n0 / ppc
    volumes = []
    speed_limit = 7

    for it in range(frames):
        mapPartsToMAC(vel=vel, flags=flags, velOld=velOld, parts=pp,
                      partVel=pVel, weight=mapWeights)
        extrapolateMACFromWeight(vel=vel, distance=2, weight=mapWeights)

        if method != FIXED_VOL or it == 0:
            markFluidCells(parts=pp, flags=flags)

        addGravity(flags=flags, vel=vel, gravity=(0, gravity, 0),
                   scale=False)
        setWallBcs(flags=flags, vel=vel)
        solvePressure(flags=flags, vel=vel, pressure=pressure, phi=phi)

        maxVel = vel.getMaxAbs()
        if maxVel > speed_limit:
            vel.clamp_norm(speed_limit)

        dist = min(int(maxVel * 1.25 + 2), 8)
        extrapolateMACSimple(flags=flags, vel=vel, distance=dist,
                             intoObs=False)

        set_particles_pos0(pp=pp)
        flipVelocityUpdate(vel=vel, velOld=velOld, flags=flags, parts=pp,
                           partVel=pVel, flipRatio=0.9)
        limit_particle_velocity(pVel, speed_limit)

        pp.advectInGrid(flags=flags, vel=vel, integrationMode=IntEuler,
                        deleteInObstacle=False, stopInObstacle=False)
        if method != FIXED_VOL:
            advectSemiLagrange(flags=flags, vel=vel, grid=phi, order=1)

        s.timestep = limit_time_step_to_one_cell_movement(pp, s.timestep)

        if method == FIXED_VOL:
            fixed_volume_advection(pp=pp, pVel=pVel, flags=flags,
                                   dt=s.timestep, dim=dim, ppc=ppc,
                                   phi=phi, it=it)
        if method == CORRECT19:
            correct19.main(s, flags, pp, vel, pindex, gpi, phiObs)

        # level set from particles
        gridParticleIndex(parts=pp, flags=flags, indexSys=pindex, index=gpi)
        unionParticleLevelset(pp, pindex, flags, gpi, phiParts, 1.0)
        if method != FIXED_VOL:
            phi.copyFrom(phiParts)
            extrapolateLsSimple(phi=phi, distance=4, inside=True)
            markFluidCells(parts=pp, flags=flags)

        s.step()

        # uniform volume measure for every method: cells occupied by >=1
        # particle (compression = fewer occupied cells, FLIP's failure mode)
        act = np.asarray(pp.parts.active_mask())
        pos = np.asarray(pp.parts.pos)[act]
        szs, sys_, sxs = flags.dom.shape
        ii = np.clip(pos[:, 0].astype(np.int64), 0, sxs - 1)
        jj = np.clip(pos[:, 1].astype(np.int64), 0, sys_ - 1)
        kk = np.clip(pos[:, 2].astype(np.int64), 0, szs - 1)
        occ = int(len(np.unique((kk * sys_ + jj) * sxs + ii)))
        volumes.append(occ)
        if verbose and it % 10 == 9:
            mantaMsg("it %d: parts=%d occupied_cells=%d (start %d)" %
                     (it + 1, pp.pySize(), occ, int(vol0)), 0)

    return volumes


if __name__ == "__main__":
    method = int(sys.argv[1]) if len(sys.argv) > 1 else FIXED_VOL
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    vols = run_zflip(method, frames, res)
    mantaMsg("zflip method=%d final occupied=%d min=%d max=%d" %
             (method, vols[-1], min(vols), max(vols)), 0)
