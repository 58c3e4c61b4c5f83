"""Fast window-select advection must match the faithful gather path when
displacements stay within the window and away from borders."""
import numpy as np
import jax
import jax.numpy as jnp

from mantaflow_tpu.core import flags as fl
from mantaflow_tpu.core.domain import Domain
from mantaflow_tpu.ops import advection as adv
from mantaflow_tpu.ops import advection_fast as advf
from mantaflow_tpu.models import smoke
from mantaflow_tpu.core.shapes import Sphere


def _setup(res=20, vmax=1.5, seed=0):
    dom = Domain(size=(res, res, res), dim=3)
    flags = fl.init_domain(dom, 1)
    flags = fl.fill_grid(flags, fl.TypeFluid)
    key = jax.random.PRNGKey(seed)
    vel = jax.random.uniform(key, (3,) + dom.shape, jnp.float32, -vmax, vmax)
    grid = jax.random.uniform(jax.random.PRNGKey(seed + 1), dom.shape,
                              jnp.float32)
    return dom, flags, vel, grid


def test_fast_real_matches_gather_order1():
    dom, flags, vel, grid = _setup()
    dt = jnp.float32(1.0)
    ref = adv.advect_real(flags, vel, grid, dt, order=1)
    fast = advf.advect_real_fast(flags, vel, grid, dt, dom, k=3, order=1)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=2e-5)


def test_fast_real_matches_gather_order2():
    dom, flags, vel, grid = _setup()
    dt = jnp.float32(1.0)
    ref = adv.advect_real(flags, vel, grid, dt, order=2, clamp_mode=2)
    fast = advf.advect_real_fast(flags, vel, grid, dt, dom, k=3, order=2)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=2e-5)


def test_fast_mac_matches_gather_order2():
    dom, flags, vel, grid = _setup()
    dt = jnp.float32(1.0)
    ref = adv.advect_mac(flags, vel, vel, dt, order=2, clamp_mode=2)
    fast = advf.advect_mac_fast(flags, vel, vel, dt, dom, k=3, order=2)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=2e-5)


def test_fast_smoke_model_close_to_faithful():
    """Whole fused steps: fast path tracks the faithful path closely over a
    short plume run."""
    res = 16
    dom = Domain(size=(res, res, res), dim=3)
    src = Sphere(center=(8.0, 3.0, 8.0), radius=2.5)
    p_ref = smoke.SmokeParams(buoyancy=(0.0, -6e-4, 0.0))
    p_fast = smoke.SmokeParams(buoyancy=(0.0, -6e-4, 0.0), window=3)
    st_ref = smoke.make_smoke_state(dom, p_ref, source_shape=src)
    st_fast = smoke.make_smoke_state(dom, p_fast, source_shape=src)
    for _ in range(5):
        st_ref = smoke.smoke_step(st_ref, dom, p_ref)
        st_fast = smoke.smoke_step(st_fast, dom, p_fast)
    np.testing.assert_allclose(np.asarray(st_fast.density),
                               np.asarray(st_ref.density), atol=1e-4)
    np.testing.assert_allclose(np.asarray(st_fast.vel),
                               np.asarray(st_ref.vel), atol=1e-4)
