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


def _drift(vols, vol0):
    v = np.asarray(vols, np.float64)
    return float(np.abs(v - vol0).max() / vol0)


def test_zflip_volume_ordering():
    from zflip import CORRECT19, FIXED_VOL, FLIP, run_zflip
    frames, res = 30, 24
    runs = {}
    for m in (FLIP, FIXED_VOL, CORRECT19):
        runs[m] = run_zflip(m, frames, res, verbose=False)
    vol0 = runs[FLIP][0]

    d_flip = _drift(runs[FLIP][5:], vol0)
    d_fv = _drift(runs[FIXED_VOL][5:], vol0)
    d_c19 = _drift(runs[CORRECT19][5:], vol0)
    print(f"volume drift: FLIP={d_flip:.3f} CORRECT19={d_c19:.3f} "
          f"FIXED_VOL={d_fv:.3f}")

    # fixed-volume pins the occupied volume; FLIP drifts the most
    assert d_fv < d_flip, "FIXED_VOL must drift less than FLIP"
    assert d_fv < 0.15, "FIXED_VOL volume should stay within 15%"
    # all methods stay stable (no blowup/vanishing)
    for m, vols in runs.items():
        assert min(vols) > 0.3 * vol0 and max(vols) < 3 * vol0
