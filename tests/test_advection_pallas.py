"""Pallas window-advection kernel vs the XLA window + exact gather paths.

The Pallas kernel (ops/advection_pallas.py) must reproduce
advection_fast.window_interp exactly (same tap window, same clamping), and
the MacCormack drivers must agree with both the XLA window path and — on
CFL-bounded smooth fields — the exact gather path of ops/advection.py.
Runs in interpreter mode on the CPU test mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mantaflow_tpu.core.domain import Domain
from mantaflow_tpu.core import flags as fl
from mantaflow_tpu.ops import advection as adv
from mantaflow_tpu.ops import advection_fast as advf
from mantaflow_tpu.ops import advection_pallas as advp


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    Z, Y, X = 12, 16, 24
    dom = Domain(size=(X, Y, Z), dim=3)
    src = jnp.asarray(rng.rand(Z, Y, X).astype(np.float32))
    ok = jnp.asarray(rng.rand(Z, Y, X) > 0.3)
    zz, yy, xx = np.meshgrid(np.arange(Z), np.arange(Y), np.arange(X),
                             indexing="ij")
    disp = (rng.rand(3, Z, Y, X) * 2 - 1) * 3.8  # exceeds k: tests clamping
    px = jnp.asarray((xx + 0.5 + disp[0]).astype(np.float32))
    py = jnp.asarray((yy + 0.5 + disp[1]).astype(np.float32))
    pz = jnp.asarray((zz + 0.5 + disp[2]).astype(np.float32))
    return dom, src, ok, px, py, pz


def test_window_pass_matches_window_interp(setup):
    dom, src, ok, px, py, pz = setup
    ref = advf.window_interp(src, px, py, pz, dom, 3)
    out = advp.window_pass(src, px, py, pz, dom, 3)
    assert float(jnp.max(jnp.abs(ref - out))) < 1e-6


def test_window_pass_minmax(setup):
    dom, src, ok, px, py, pz = setup
    refs = advf.window_interp(src, px, py, pz, dom, 3, want_minmax=True)
    outs = advp.window_pass(src, px, py, pz, dom, 3, want_minmax=True)
    for r, o in zip(refs, outs):
        r = jnp.asarray(r, jnp.float32)
        o = jnp.asarray(o, jnp.float32)
        assert float(jnp.max(jnp.abs(r - o))) < 1e-6


def test_window_pass_minmax_ok_mask(setup):
    dom, src, ok, px, py, pz = setup
    refs = advf.window_interp(src, px, py, pz, dom, 3, ok_mask=ok,
                              want_minmax=True)
    outs = advp.window_pass(src, px, py, pz, dom, 3, ok_mask=ok,
                            want_minmax=True)
    for r, o in zip(refs, outs):
        r = jnp.asarray(r, jnp.float32)
        o = jnp.asarray(o, jnp.float32)
        assert float(jnp.max(jnp.abs(r - o))) < 1e-6


@pytest.fixture(scope="module")
def flow():
    """Smooth CFL<=2 flow on a walled 3D domain."""
    res = 16
    dom = Domain(size=(res, res, res), dim=3)
    flags = fl.init_domain(dom, 1)
    flags = fl.fill_grid(flags, fl.TypeFluid)
    t = np.linspace(0, 2 * np.pi, res)
    zz, yy, xx = np.meshgrid(t, t, t, indexing="ij")
    vel = jnp.asarray(np.stack([
        1.5 * np.sin(zz) * np.cos(yy),
        1.5 * np.sin(xx) * np.cos(zz),
        1.5 * np.sin(yy) * np.cos(xx)]).astype(np.float32))
    dens = jnp.asarray((np.sin(2 * xx) * np.sin(yy) * 0.5 + 0.5)
                       .astype(np.float32))
    return dom, flags, vel, dens


def test_advect_real_pl_matches_fast(flow):
    dom, flags, vel, dens = flow
    a = advf.advect_real_fast(flags, vel, dens, 1.0, dom, 2)
    b = advp.advect_real_pl(flags, vel, dens, 1.0, dom, 2)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-6


def test_advect_mac_pl_matches_fast(flow):
    dom, flags, vel, dens = flow
    a = advf.advect_mac_fast(flags, vel, vel, 1.0, dom, 2)
    b = advp.advect_mac_pl(flags, vel, vel, 1.0, dom, 2)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-6


def test_pallas_vs_exact_gather(flow):
    """Window paths equal the exact reference-semantics gather path when
    the CFL bound holds (advection_fast module contract)."""
    dom, flags, vel, dens = flow
    ex = adv.advect_real(flags, vel, dens, 1.0, order=2)
    pl_ = advp.advect_real_pl(flags, vel, dens, 1.0, dom, 2)
    assert float(jnp.max(jnp.abs(ex - pl_))) < 2e-5
    ex_m = adv.advect_mac(flags, vel, vel, 1.0, order=2)
    pl_m = advp.advect_mac_pl(flags, vel, vel, 1.0, dom, 2)
    assert float(jnp.max(jnp.abs(ex_m - pl_m))) < 2e-5


@pytest.mark.parametrize("dyn", [False, True])
def test_window_pass_lane_padding(dyn):
    """Grids whose x extent is not a lane multiple (128 on TPU, 8 in
    interpret mode) are edge-padded inside the pass; results must equal
    the XLA window path on the unpadded grid. X=20 pads to 24 here."""
    rng = np.random.RandomState(3)
    Z, Y, X = 12, 16, 20
    dom = Domain(size=(X, Y, Z), dim=3)
    src = jnp.asarray(rng.rand(Z, Y, X).astype(np.float32))
    ok = jnp.asarray(rng.rand(Z, Y, X) > 0.3)
    zz, yy, xx = np.meshgrid(np.arange(Z), np.arange(Y), np.arange(X),
                             indexing="ij")
    disp = (rng.rand(3, Z, Y, X) * 2 - 1) * 3.8
    px = jnp.asarray((xx + 0.5 + disp[0]).astype(np.float32))
    py = jnp.asarray((yy + 0.5 + disp[1]).astype(np.float32))
    pz = jnp.asarray((zz + 0.5 + disp[2]).astype(np.float32))

    refs = advf.window_interp(src, px, py, pz, dom, 3, ok_mask=ok,
                              want_minmax=True)
    outs = advp.window_pass(src, px, py, pz, dom, 3, ok_mask=ok,
                            want_minmax=True, dyn=dyn)
    for r, o, name in zip(refs, outs, ["out", "min", "max", "have"]):
        r = jnp.asarray(r, jnp.float32)
        o = jnp.asarray(o, jnp.float32)
        assert o.shape == (Z, Y, X)
        assert float(jnp.max(jnp.abs(r - o))) < 1e-6, name


def test_window_pass_zshard_matches_unsharded():
    """The multi-chip z-sharded window pass (shard_map + ppermute halo
    exchange, window_pass_zshard) must equal the single-device kernel on
    all four minmax outputs."""
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    shard_map = jax.shard_map

    res, k, nsh = 32, 3, 4
    dom = Domain(size=(res, res, res), dim=3)
    rng = np.random.RandomState(5)
    src = jnp.asarray(rng.rand(res, res, res).astype(np.float32))
    zz, yy, xx = np.meshgrid(np.arange(res), np.arange(res),
                             np.arange(res), indexing="ij")
    disp = np.stack([np.sin(yy * 0.2) * 2.5, np.cos(zz * 0.3) * 2.5,
                     np.sin(xx * 0.15) * 2.5]).astype(np.float32)
    px = jnp.asarray(xx + disp[0])
    py = jnp.asarray(yy + disp[1])
    pz = jnp.asarray(zz + disp[2])
    ok = jnp.asarray(rng.rand(res, res, res) > 0.3)

    ref = advp.window_pass(src, px, py, pz, dom, k, ok_mask=ok,
                           want_minmax=True, dyn=True)

    mesh = Mesh(np.array(jax.devices()[:nsh]), ("z",))
    f = shard_map(
        lambda s, a, b, c, o: advp.window_pass_zshard(
            s, a, b, c, dom, k, "z", nsh, ok_mask=o, want_minmax=True),
        mesh=mesh, in_specs=(P("z"),) * 5, out_specs=(P("z"),) * 4,
        check_vma=False)  # pallas_call outputs carry no vma annotation
    got = jax.jit(f)(src, px, py, pz, ok)

    for r, g, name in zip(ref, got, ["out", "min", "max", "have"]):
        d = float(jnp.max(jnp.abs(r.astype(jnp.float32)
                                  - g.astype(jnp.float32))))
        assert d < 1e-6, f"{name}: {d}"
