"""zflip method comparison: volume drift ordering (VERDICT r1 item 6).

The fork's FIXED_VOL plugin is absent from the reference binary (see
PARITY.md §2.14), so the validation here is the method's defining
property on a shared dam: occupied-volume drift is lowest for FIXED_VOL
(count-preserving redistribution), higher for plain FLIP.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scenes"))


def _loss(vols, vol0):
    """Max fractional volume LOSS (compression) — the failure mode
    volume-preserving FLIP exists to fix."""
    v = np.asarray(vols, np.float64)
    return float(np.maximum(0.0, vol0 - v).max() / vol0)


def test_zflip_volume_ordering():
    from zflip import CORRECT19, FIXED_VOL, FLIP, run_zflip
    frames, res = 40, 24
    runs = {}
    for m in (FLIP, FIXED_VOL, CORRECT19):
        runs[m] = run_zflip(m, frames, res, verbose=False)
    vol0 = max(runs[FLIP][:3])

    l_flip = _loss(runs[FLIP][5:], vol0)
    l_fv = _loss(runs[FIXED_VOL][5:], vol0)
    l_c19 = _loss(runs[CORRECT19][5:], vol0)
    print(f"volume loss: FLIP={l_flip:.3f} CORRECT19={l_c19:.3f} "
          f"FIXED_VOL={l_fv:.3f}")

    # fixed-volume bounds compression (ppc cap => occupied >= N/ppc);
    # plain FLIP clumps and loses occupied volume
    assert l_fv <= l_flip + 1e-6, "FIXED_VOL must compress less than FLIP"
    assert l_fv < 0.10, "FIXED_VOL volume loss should stay under 10%"
    # all methods stay stable (no blowup/vanishing)
    for m, vols in runs.items():
        assert min(vols) > 0.3 * vol0 and max(vols) < 3 * vol0


def test_zflip_flagship_obstacle_mesh(tmp_path):
    """Round-5 flagship composition (VERDICT r4 item 5): each method runs
    with the moving obstacle + per-frame upres mesh generation
    (reference zflip.py:96-160 moving_obstacle, :181-251 mesh_generator),
    and the static-obstacle variant runs too."""
    from zflip import (CORRECT19, FIXED_VOL, FLIP, OBS_MOVING, OBS_STATIC,
                       run_zflip)
    for m in (FLIP, FIXED_VOL, CORRECT19):
        vols = run_zflip(m, frames=2, res=20, verbose=False,
                         obstacle=OBS_MOVING, gen_mesh=True,
                         out_dir=str(tmp_path), mesh_every=2)
        assert len(vols) == 2 and vols[-1] > 0
        meshes = list(tmp_path.glob("surface_*.bobj.gz"))
        assert meshes, "upres mesh generator must write .bobj.gz"
        for f in meshes:
            f.unlink()
    vols = run_zflip(FLIP, frames=2, res=20, verbose=False,
                     obstacle=OBS_STATIC)
    assert len(vols) == 2 and vols[-1] > 0


def test_set_bound_MAC2_semantics():
    """kn_set_bound_MAC2 (grid.cpp:695-714) vs a direct per-cell numpy
    transcription of the kernel's conditions."""
    from mantaflow_tpu import Solver, MACGrid, vec3
    rng = np.random.default_rng(3)
    s = Solver(name='t', gridSize=vec3(9, 7, 8))
    v = s.create(MACGrid)
    data = rng.normal(size=v.data.shape).astype(np.float32)
    v.from_numpy(data)
    w = 1
    v.set_bound_MAC2(value=vec3(0, 0, 0), boundaryWidth=w)
    out = np.asarray(v.data)
    sz, sy, sx = 8, 7, 9
    exp = data.copy().reshape(3, sz, sy, sx)
    for k in range(sz):
        for j in range(sy):
            for i in range(sx):
                zb = k <= w or k >= sz - 1 - w
                if (i <= w + 1 or i >= sx - 1 - w or j <= w
                        or j >= sy - 1 - w or zb):
                    exp[0, k, j, i] = 0
                if (i <= w or i >= sx - 1 - w or j <= w + 1
                        or j >= sy - 1 - w or zb):
                    exp[1, k, j, i] = 0
                if (i <= w or i >= sx - 1 - w or j <= w
                        or j >= sy - 1 - w or k <= w + 1
                        or k >= sz - 1 - w):
                    exp[2, k, j, i] = 0
    assert np.array_equal(out.reshape(3, sz, sy, sx), exp)
