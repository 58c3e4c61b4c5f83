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
