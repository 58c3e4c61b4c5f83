"""PPC auto-escalation: the bucketed pipeline must never lose particles.

Forces overflow by starting a dam at a tiny PPC, then checks the auto
driver escalates (rebin at higher PPC + redo step) and conserves the
particle count where the plain step drops."""
import dataclasses

import numpy as np

from mantaflow_tpu.core.domain import Domain
from mantaflow_tpu.models import flip
from mantaflow_tpu.ops import flip_bucket as fb


def _tiny_dam(ppc):
    dom = Domain(size=(16, 16, 16), dim=3)
    params = flip.FlipParams(gravity=(0.0, -0.01, 0.0), ghost_fluid=True,
                             cg_accuracy=1e-3, ring_only_obstacles=True)
    st = flip.make_dam_state_bucketed(dom, params, discretization=2,
                                      ppc=ppc)
    return dom, params, st


def test_rebin_to_ppc_preserves_particles():
    dom, params, st = _tiny_dam(ppc=9)
    n0 = int(st.buckets.count())
    bk = fb.rebin_to_ppc(st.buckets, dom, 12)
    assert bk.ppc == 12
    assert int(bk.count()) == n0
    assert int(bk.dropped) == 0
    # same multiset of positions
    def poss(b):
        v = np.asarray(b.valid).reshape(-1)
        p = np.stack([np.asarray(a).reshape(-1)[v]
                      for a in (b.px, b.py, b.pz)], -1)
        return p[np.lexsort(p.T)]
    np.testing.assert_array_equal(poss(st.buckets), poss(bk))


def test_auto_step_conserves_on_overflow():
    # ppc=8 fits the 2^3-discretization dam exactly. Force an overflow
    # deterministically: move one full cell's stored positions into its
    # (also full) +x neighbor, so the step's rebin sees 16 arrivals in an
    # 8-slot bucket and must drop with the plain step.
    dom, params, st = _tiny_dam(ppc=8)
    n0 = int(st.buckets.count())

    valid = np.asarray(st.buckets.valid)
    full = valid.all(axis=0)
    t0 = next(t for t in np.nonzero(full)[0]
              if t + 1 < full.size and full[t + 1])
    px = np.array(st.buckets.px)  # writable copy
    px[:, t0] += 1.0  # now inside cell t0+1
    st = dataclasses.replace(
        st, buckets=dataclasses.replace(st.buckets,
                                        px=np.asarray(px)))

    plain = flip.flip_step_bucketed(st, dom, params)
    assert int(plain.buckets.dropped) > 0, \
        "test setup: expected the plain step to drop"

    auto = flip.flip_step_bucketed_auto(st, dom, params)
    assert int(auto.buckets.dropped) == 0
    assert int(auto.buckets.count()) == n0
    assert auto.buckets.ppc > 8  # escalation actually happened
    # and the escalated state keeps stepping cleanly
    auto = flip.flip_step_bucketed_auto(auto, dom, params)
    assert int(auto.buckets.dropped) == 0
    assert int(auto.buckets.count()) == n0


def test_chunked_runner_matches_stepwise_and_conserves():
    """flip_run_bucketed_auto == N stepwise auto steps (no-overflow case),
    and conserves particles through a forced overflow."""
    dom, params, st = _tiny_dam(ppc=12)
    n0 = int(st.buckets.count())
    ref = st
    for _ in range(5):
        ref = flip.flip_step_bucketed_auto(ref, dom, params)
    out = flip.flip_run_bucketed_auto(st, dom, params, 5, check_every=2)
    assert int(out.buckets.dropped) == 0
    np.testing.assert_array_equal(np.asarray(ref.vel), np.asarray(out.vel))
    np.testing.assert_array_equal(np.asarray(ref.buckets.px),
                                  np.asarray(out.buckets.px))

    # overflow path: tiny ppc forces escalation inside a chunk
    dom2, params2, st2 = _tiny_dam(ppc=8)
    n2 = int(st2.buckets.count())
    valid = np.asarray(st2.buckets.valid)
    full = valid.all(axis=0)
    t0 = next(t for t in np.nonzero(full)[0]
              if t + 1 < full.size and full[t + 1])
    px = np.array(st2.buckets.px)
    px[:, t0] += 1.0
    st2 = dataclasses.replace(
        st2, buckets=dataclasses.replace(st2.buckets, px=np.asarray(px)))
    out2 = flip.flip_run_bucketed_auto(st2, dom2, params2, 4, check_every=4)
    assert int(out2.buckets.dropped) == 0
    assert int(out2.buckets.count()) == n2
    assert out2.buckets.ppc > 8
