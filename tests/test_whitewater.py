"""Whitewater secondary particles: potentials, sampling, update."""
import numpy as np
import jax.numpy as jnp

from mantaflow_tpu import *


def test_whitewater_pipeline():
    res = 24
    s = Solver(name="w", gridSize=vec3(res, res, res))
    s.timestep = 1.0
    flags = s.create(FlagGrid)
    flags.initDomain()
    phi = s.create(LevelsetGrid)
    # fluid pool with a fast-moving surface region
    pool = Box(s, p0=vec3(1, 1, 1), p1=vec3(res - 1, 10, res - 1))
    phi.setConst(0.5)
    phi.join(pool.computeLevelset())
    flags.updateFromLevelset(phi)
    vel = s.create(MACGrid)
    rng = np.random.RandomState(0)
    v = rng.randn(3, res, res, res).astype(np.float32) * 3.0
    vel.from_numpy(v)

    potTA = s.create(RealGrid)
    potWC = s.create(RealGrid)
    potKE = s.create(RealGrid)
    nr = s.create(RealGrid)
    normal = s.create(VecGrid)
    flipComputeSecondaryParticlePotentials(
        potTA=potTA, potWC=potWC, potKE=potKE, neighborRatio=nr, flags=flags,
        v=vel, normal=normal, phi=phi, radius=2, tauMinTA=0.1, tauMaxTA=5.0,
        tauMinWC=0.1, tauMaxWC=5.0, tauMinKE=0.01, tauMaxKE=5.0,
        scaleFromManta=1.0 / res)
    assert potKE.to_numpy().max() > 0  # fast fluid has kinetic potential
    assert potTA.to_numpy().max() > 0  # shear produces trapped-air potential
    assert 0 <= nr.to_numpy().max() <= 1.0

    pts_sec = s.create(BasicParticleSystem)
    v_sec = pts_sec.create(PdataVec3)
    l_sec = pts_sec.create(PdataReal)
    f_sec = pts_sec.create(PdataVec3)
    flipSampleSecondaryParticles(
        mode="single", flags=flags, v=vel, pts_sec=pts_sec, v_sec=v_sec,
        l_sec=l_sec, lMin=2.0, lMax=5.0, potTA=potTA, potWC=potWC,
        potKE=potKE, neighborRatio=nr, c_s=0.3, c_b=0.8, k_ta=40.0,
        k_wc=40.0)
    n0 = int(pts_sec.parts.active_mask().sum())
    assert n0 > 10  # particles were emitted

    from mantaflow_tpu.core.particles import PSPRAY, PBUBBLE, PFOAM
    types = np.asarray(pts_sec.parts.flags)[
        np.asarray(pts_sec.parts.active_mask())]
    assert ((types & (PSPRAY | PBUBBLE | PFOAM)) != 0).all()

    for _ in range(3):
        flipUpdateSecondaryParticles(
            mode="linear", pts_sec=pts_sec, v_sec=v_sec, l_sec=l_sec,
            f_sec=f_sec, flags=flags, v=vel, neighborRatio=nr, radius=2,
            gravity=vec3(0, -0.003, 0), k_b=0.5, k_d=0.6, c_s=0.3, c_b=0.8,
            scale=False, antitunneling=2)
    n1 = int(pts_sec.parts.active_mask().sum())
    assert n1 <= n0  # lifetimes/obstacles can only remove
    assert np.isfinite(pts_sec.to_numpy()).all()

    flipDeleteParticlesInObstacle(pts=pts_sec, flags=flags)
    assert int(pts_sec.parts.active_mask().sum()) <= n1

    # 'multiple' (MoreCylinders) sampling emits at least as densely as
    # 'single' (2^dim interpolated sub-cylinders per cell)
    pts_m = s.create(BasicParticleSystem)
    v_m = pts_m.create(PdataVec3)
    l_m = pts_m.create(PdataReal)
    flipSampleSecondaryParticles(
        mode="multiple", flags=flags, v=vel, pts_sec=pts_m, v_sec=v_m,
        l_sec=l_m, lMin=2.0, lMax=5.0, potTA=potTA, potWC=potWC,
        potKE=potKE, neighborRatio=nr, c_s=0.3, c_b=0.8, k_ta=40.0,
        k_wc=40.0)
    nm = int(pts_m.parts.active_mask().sum())
    assert nm > 10
    assert np.isfinite(pts_m.to_numpy()).all()

    # 'cubic' update: spline-averaged drive velocity stays finite and moves
    # foam particles with the neighborhood flow
    f_m = pts_m.create(PdataVec3)
    before = pts_m.to_numpy().copy()
    flipUpdateSecondaryParticles(
        mode="cubic", pts_sec=pts_m, v_sec=v_m, l_sec=l_m, f_sec=f_m,
        flags=flags, v=vel, neighborRatio=nr, radius=1,
        gravity=vec3(0, -0.003, 0), k_b=0.5, k_d=0.6, c_s=0.3, c_b=0.8,
        scale=False, antitunneling=2)
    after = pts_m.to_numpy()
    assert np.isfinite(after).all()
    moved = np.abs(after - before[:after.shape[0]]).max() \
        if after.shape == before.shape else 1.0
    assert moved > 1e-4

    import pytest
    with pytest.raises(ValueError):
        flipUpdateSecondaryParticles(
            mode="verlet", pts_sec=pts_m, v_sec=v_m, l_sec=l_m, f_sec=f_m,
            flags=flags, v=vel, neighborRatio=nr, radius=1,
            gravity=vec3(0, -0.003, 0), k_b=0.5, k_d=0.6, c_s=0.3, c_b=0.8)

    # levelset helpers
    f2 = s.create(FlagGrid)
    f2.initDomain()
    setFlagsFromLevelset(flags=f2, phi=phi)
    assert (np.asarray(f2.data)[5, 5, 5] & FlagFluid) != 0
    setMACFromLevelset(v=vel, phi=phi, c=vec3(0, 0, 0))
    assert np.abs(vel.to_numpy()[:, :, 15:, :]).max() < 1e-6  # air zeroed


def test_legacy_potential_kernels():
    """Legacy per-potential kernels (secondaryparticles.cpp:540-701):
    each one matches the physics of the combined modern op on its own
    term, with legacy conventions (jtype selects fluid neighbors,
    unscaled h falloff)."""
    res = 20
    s = Solver(name="wl", gridSize=vec3(res, res, res))
    flags = s.create(FlagGrid)
    flags.initDomain()
    phi = s.create(LevelsetGrid)
    pool = Box(s, p0=vec3(1, 1, 1), p1=vec3(res - 1, 9, res - 1))
    phi.setConst(0.5)
    phi.join(pool.computeLevelset())
    flags.updateFromLevelset(phi)
    vel = s.create(MACGrid)
    rng = np.random.RandomState(1)
    vel.from_numpy(rng.randn(3, res, res, res).astype(np.float32) * 2.0)

    normal = s.create(VecGrid)
    flipComputeSurfaceNormals(normal, phi)
    n = normal.to_numpy()
    lens = np.sqrt((n ** 2).sum(axis=0))
    assert np.isfinite(n).all()
    assert lens.max() <= 1.0 + 1e-5  # normalized

    potTA = s.create(RealGrid)
    flipComputePotentialTrappedAir(pot=potTA, flags=flags, v=vel, radius=2,
                                   tauMin=0.01, tauMax=2.0,
                                   scaleFromManta=1.0 / res)
    ta = potTA.to_numpy()
    assert 0.0 <= ta.min() and ta.max() <= 1.0
    assert ta.max() > 0  # sheared random field traps air

    potKE = s.create(RealGrid)
    flipComputePotentialKineticEnergy(pot=potKE, flags=flags, v=vel,
                                      tauMin=0.001, tauMax=1.0,
                                      scaleFromManta=1.0 / res)
    ke = potKE.to_numpy()
    assert 0.0 <= ke.min() and ke.max() <= 1.0 and ke.max() > 0
    # KE potential is only on itype (fluid) cells
    fluid = (flags.to_numpy() & FlagFluid) != 0
    assert (ke[~fluid] == 0).all()

    potWC = s.create(RealGrid)
    flipComputePotentialWaveCrest(pot=potWC, flags=flags, v=vel, radius=2,
                                  normal=normal, tauMin=0.01, tauMax=2.0,
                                  scaleFromManta=1.0 / res)
    wc = potWC.to_numpy()
    assert 0.0 <= wc.min() and wc.max() <= 1.0

    nr = s.create(RealGrid)
    flipUpdateNeighborRatio(flags=flags, neighborRatio=nr, radius=1)
    r = nr.to_numpy()
    assert 0.0 <= r.min() and r.max() <= 1.0
    # deep interior pool cells see all-fluid neighborhoods
    assert r[4, 4:6, 8:12].min() > 0.99


def test_potentials_match_reference_binary():
    """One-shot comparison vs the reference binary on shared inputs
    (goldens in testdata_ref, generated by the locally built binary).
    TA/KE/neighborRatio are bit-exact (modern and legacy); wave crest is
    bit-exact in the interior — the only divergence is a band at 2-3 cells
    from the wall where the binary's own kernels read out-of-bounds
    neighbors (KERNEL(bnd=1) with radius-2 reads), which is irreproducible
    by construction."""
    import os
    import jax.numpy as jnp
    from mantaflow_tpu.core.domain import Domain
    from mantaflow_tpu.io.uni import read_grid_uni
    from mantaflow_tpu.ops import whitewater as ww

    res = 24
    dom = Domain(size=(res, res, res), dim=3)
    d = os.path.join(os.path.dirname(__file__), "testdata_ref")

    def rd(n):
        a, _ = read_grid_uni(os.path.join(d, f"ww_{n}.uni"))
        return jnp.asarray(a)

    flags = rd("flags").astype(jnp.int32)
    vel = rd("vel")
    phi = rd("phi")

    ta, wc, ke, nr, _ = ww.compute_secondary_particle_potentials(
        flags, vel, phi, dom, radius=2, tau_min_ta=0.1, tau_max_ta=5.0,
        tau_min_wc=0.1, tau_max_wc=5.0, tau_min_ke=0.01, tau_max_ke=5.0,
        scale_from_manta=1.0 / res)
    assert float(jnp.abs(ta - rd("potTA")).max()) == 0.0
    assert float(jnp.abs(ke - rd("potKE")).max()) == 0.0
    assert float(jnp.abs(nr - rd("nr")).max()) == 0.0
    dwc = np.abs(np.asarray(wc) - np.asarray(rd("potWC")))
    assert dwc[4:-4, 4:-4, 4:-4].max() < 1e-6       # interior exact
    assert (dwc > 1e-6).sum() <= 20                  # boundary band only

    lN = ww.compute_surface_normals(phi, dom)
    assert float(jnp.abs(lN - rd("lN")).max()) == 0.0
    lTA = ww.compute_potential_trapped_air(flags, vel, dom, 2, 0.01, 2.0,
                                           1.0 / res)
    lKE = ww.compute_potential_kinetic_energy(flags, vel, dom, 0.001, 1.0,
                                              1.0 / res)
    lWC = ww.compute_potential_wave_crest(flags, vel, dom, 2, lN, 0.01, 2.0,
                                          1.0 / res)
    lNR = ww.update_neighbor_ratio(flags, dom, 1)
    assert float(jnp.abs(lTA - rd("lTA")).max()) == 0.0
    assert float(jnp.abs(lKE - rd("lKE")).max()) == 0.0
    assert float(jnp.abs(lNR - rd("lNR")).max()) == 0.0
    dl = np.abs(np.asarray(lWC) - np.asarray(rd("lWC")))
    assert dl[4:-4, 4:-4, 4:-4].max() == 0.0         # interior exact
