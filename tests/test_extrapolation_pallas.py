"""Pallas BFS-extrapolation layer kernel == XLA form (interpret mode)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mantaflow_tpu.core.domain import Domain
from mantaflow_tpu.ops import extrapolation as xtr
from mantaflow_tpu.ops.extrapolation_pallas import extrap_layers_pallas


def _rand_state(res=16, seed=0):
    rng = np.random.default_rng(seed)
    dom = Domain(size=(res, res, res), dim=3)
    vel = jnp.asarray(rng.normal(size=(3, res, res, res)).astype(np.float32))
    weight = jnp.asarray(
        (rng.uniform(size=(3, res, res, res)) < 0.25).astype(np.float32)
        * rng.uniform(0.2, 3.0, size=(3, res, res, res)).astype(np.float32))
    return dom, vel, weight


def test_from_weight_layers_match():
    dom, vel, weight = _rand_state()
    ref_v, ref_w = xtr.extrapolate_mac_from_weight(vel, weight, dom, 2)

    from mantaflow_tpu.core.masks import interior_mask
    inter = interior_mask(dom, 1)
    vcomps = [vel[c] for c in range(3)]
    wcomps = [jnp.where(inter & (weight[c] > 0.0), 1.0,
                        jnp.where(inter, 0.0, weight[c])) for c in range(3)]
    vp, wp = extrap_layers_pallas(vcomps, wcomps, dom, 1, 2, interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.stack(vp)), np.asarray(ref_v),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(jnp.stack(wp)), np.asarray(ref_w),
                               atol=1e-6)


def test_mac_simple_layers_match():
    from mantaflow_tpu.core import flags as fl
    from mantaflow_tpu.core.masks import interior_mask, shift

    dom, vel, _ = _rand_state(seed=3)
    res = dom.shape[0]
    rng = np.random.default_rng(5)
    f = np.full(dom.shape, fl.TypeEmpty, np.int32)
    blob = rng.uniform(size=dom.shape) < 0.2
    f[blob] = fl.TypeFluid
    f[0] = f[-1] = fl.TypeObstacle
    flags = jnp.asarray(f)

    ref = xtr.extrapolate_mac_simple(flags, vel, dom, 3)

    inter = interior_mask(dom, 1)
    fluid = fl.is_fluid(flags)
    comps = [vel[c] for c in range(3)]
    marks = []
    for c, ax in enumerate("xyz"):
        mark = fluid | shift(fluid, -1, ax)
        marks.append(jnp.where(mark & inter, 1.0, 0.0))
    vp, _ = extrap_layers_pallas(comps, marks, dom, 1, 3, interpret=True)
    got = xtr._extrapolate_into_bnd(flags, jnp.stack(vp), dom)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_ls_layers_match():
    from mantaflow_tpu.core.masks import interior_mask
    from mantaflow_tpu.ops.extrapolation_pallas import extrap_ls_layers_pallas

    dom, _, _ = _rand_state(seed=9)
    rng = np.random.default_rng(11)
    phi = jnp.asarray(rng.normal(size=dom.shape).astype(np.float32) * 3.0)
    ref = xtr.extrapolate_ls_simple(phi, dom, 4, inside=False)

    inter = interior_mask(dom, 1)
    tmp = jnp.where(inter & (phi < 0.0), 1, 0).astype(jnp.int32)
    got, tm = extrap_ls_layers_pallas(phi, tmp.astype(jnp.float32), dom,
                                      1.0, 4, interpret=True)
    got = jnp.where((tm.astype(jnp.int32) == 0) & inter, 1.0 * 6, got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
