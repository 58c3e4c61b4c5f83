"""Every fused step must trace with ZERO captured constants.

Captured concrete arrays (numpy masks, module-level jnp scalars, (3,)
bound vectors) become hoisted device-const buffers; jax 0.9.0's cpp jit
fast path stops supplying them once any other fast-path entry has
dispatched ("Execution supplied N buffers but compiled program expected
M"), breaking any process that runs a model at two configs. They also cost
HBM reads on TPU. See the round-3 fix commit for the original hunt.
"""

import jax
import pytest

from mantaflow_tpu.core.domain import Domain
from mantaflow_tpu.core.shapes import Sphere
from mantaflow_tpu.models import flip, smoke


def _consts(fn, *args):
    return jax.make_jaxpr(fn)(*args).consts


def test_smoke_step_no_consts():
    dom = Domain(size=(16, 24, 16), dim=3)
    for window in (0, 2):
        params = smoke.SmokeParams(buoyancy=(0.0, -6e-4, 0.0), window=window,
                                   vorticity_confinement=0.05)
        src = Sphere(center=(8.0, 3.0, 8.0), radius=2.5)
        st = smoke.make_smoke_state(dom, params, source_shape=src)
        cs = _consts(lambda s: smoke.smoke_step(s, dom, params), st)
        assert len(cs) == 0, [getattr(c, "shape", c) for c in cs]


def test_flip_step_no_consts():
    dom = Domain(size=(16, 16, 16), dim=3)
    params = flip.FlipParams(gravity=(0.0, -0.003, 0.0), ghost_fluid=True)
    st = flip.make_dam_state(dom, params, discretization=2)
    cs = _consts(lambda s: flip.flip_step(s, dom, params), st)
    assert len(cs) == 0, [getattr(c, "shape", c) for c in cs]


def test_flip_bucketed_step_no_consts():
    dom = Domain(size=(16, 16, 16), dim=3)
    params = flip.FlipParams(gravity=(0.0, -0.003, 0.0), ghost_fluid=True)
    st = flip.make_dam_state_bucketed(dom, params, discretization=2)
    cs = _consts(lambda s: flip.flip_step_bucketed(s, dom, params), st)
    assert len(cs) == 0, [getattr(c, "shape", c) for c in cs]


def test_mlflip_step_no_consts():
    from mantaflow_tpu.ml import mlflip
    dom = Domain(size=(16, 16, 16), dim=3)
    params = flip.FlipParams(gravity=(0.0, -0.003, 0.0))
    st = mlflip.make_mlflip_state(dom, params)
    cs = _consts(lambda s: mlflip.mlflip_step(s, dom, params), st)
    assert len(cs) == 0, [getattr(c, "shape", c) for c in cs]


def test_multi_resolution_single_process():
    """The original failure mode: two resolutions through the same jitted
    model in one process (second fast-path dispatch lost the consts)."""
    import numpy as np
    params = smoke.SmokeParams(buoyancy=(0.0, -6e-4, 0.0), window=2)
    for res in (12, 16):
        dom = Domain(size=(res, res, res), dim=3)
        src = Sphere(center=(res / 2, res * 0.2, res / 2), radius=res * 0.15)
        st = smoke.make_smoke_state(dom, params, source_shape=src)
        step = jax.jit(lambda s, d=dom: smoke.smoke_step(s, d, params))
        for _ in range(2):
            st = step(st)
            assert np.isfinite(np.asarray(st.density)).all()
