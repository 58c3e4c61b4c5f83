"""Fused FLIP model: stability, particle conservation, physics sanity."""
import numpy as np

from mantaflow_tpu.core.domain import Domain
from mantaflow_tpu.models import flip as fm


def test_flip_model_dam_2d():
    dom = Domain(size=(40, 40, 1), dim=2)
    params = fm.FlipParams(gravity=(0.0, -0.002, 0.0))
    st = fm.make_dam_state(dom, params, discretization=3, dt=0.5)
    n0 = int(st.parts.active_mask().sum())
    com0 = float(st.parts.pos[:, 0].mean())

    st = fm.flip_run(st, dom, params, 25)
    act = np.asarray(st.parts.active_mask())
    assert act.sum() == n0
    p = np.asarray(st.parts.pos)[act]
    assert np.isfinite(p).all()
    assert p[:, 0].mean() > 2.0  # collapsed rightward (com0 ~ 8)
    assert np.abs(np.asarray(st.pvel)[act]).max() < 5.0


def test_flip_model_apic_3d_gfm():
    dom = Domain(size=(24, 24, 24), dim=3)
    params = fm.FlipParams(gravity=(0.0, -0.003, 0.0), apic=True,
                           ghost_fluid=True)
    st = fm.make_dam_state(dom, params, discretization=2, dt=0.5)
    st = fm.flip_run(st, dom, params, 10)
    act = np.asarray(st.parts.active_mask())
    p = np.asarray(st.parts.pos)[act]
    assert np.isfinite(p).all()
    phi = np.asarray(st.phi)
    assert np.isfinite(phi).all()
    assert (phi < 0).sum() > 100  # a fluid region exists in the levelset
