"""Interpolation semantics vs. a direct NumPy transcription of the reference
formulas (util/interpol.h BUILD_INDEX / interpolMAC)."""
import numpy as np
import jax.numpy as jnp

from mantaflow_tpu.core.interp import interpol, interpol_mac


def _np_axis_weights(p, n):
    xi = int(p)  # trunc toward zero
    s1 = p - xi
    if p < 0:
        xi, s1 = 0, 0.0
    if n > 1 and p >= n - 1:
        xi, s1 = n - 2, 1.0
    if n == 1:
        xi, s1 = 0, 0.0
    return xi, s1


def _np_interpol(data, pos):
    sz, sy, sx = data.shape
    xi, s1 = _np_axis_weights(pos[0] - 0.5, sx)
    yi, t1 = _np_axis_weights(pos[1] - 0.5, sy)
    zi, f1 = _np_axis_weights(pos[2] - 0.5, sz)
    x1, y1, z1 = min(xi + 1, sx - 1), min(yi + 1, sy - 1), min(zi + 1, sz - 1)
    s0, t0, f0 = 1 - s1, 1 - t1, 1 - f1
    return (((data[zi, yi, xi] * t0 + data[zi, y1, xi] * t1) * s0
             + (data[zi, yi, x1] * t0 + data[zi, y1, x1] * t1) * s1) * f0
            + ((data[z1, yi, xi] * t0 + data[z1, y1, xi] * t1) * s0
               + (data[z1, yi, x1] * t0 + data[z1, y1, x1] * t1) * s1) * f1)


def test_interpol_matches_reference_formula_3d():
    rng = np.random.RandomState(0)
    data = rng.rand(6, 7, 8).astype(np.float32)
    # positions including out-of-range ones to exercise clamping
    pos = rng.uniform(-1.5, 9.5, size=(64, 3)).astype(np.float32)
    got = np.asarray(interpol(jnp.asarray(data), pos[:, 0], pos[:, 1], pos[:, 2]))
    want = np.array([_np_interpol(data, p) for p in pos], dtype=np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_interpol_exact_at_cell_centers():
    rng = np.random.RandomState(1)
    data = rng.rand(4, 5, 6).astype(np.float32)
    d = jnp.asarray(data)
    for (k, j, i) in [(0, 0, 0), (2, 3, 4), (3, 4, 5), (1, 2, 3)]:
        v = interpol(d, jnp.float32(i + 0.5), jnp.float32(j + 0.5),
                     jnp.float32(k + 0.5))
        assert abs(float(v) - data[k, j, i]) < 1e-6


def test_interpol_2d_ignores_z():
    rng = np.random.RandomState(2)
    data = rng.rand(1, 5, 6).astype(np.float32)
    d = jnp.asarray(data)
    v = interpol(d, jnp.float32(2.5), jnp.float32(3.5), jnp.float32(0.5))
    assert abs(float(v) - data[0, 3, 2]) < 1e-6


def test_interpol_mac_exact_at_faces():
    """MAC component c sampled at its own face coordinate returns the stored
    face value: u at (i, j+0.5, k+0.5)."""
    rng = np.random.RandomState(3)
    mac = rng.rand(3, 5, 6, 7).astype(np.float32)
    m = jnp.asarray(mac)
    i, j, k = 3, 2, 1
    u, v, w = interpol_mac(m, jnp.float32(i), jnp.float32(j + 0.5),
                           jnp.float32(k + 0.5))
    assert abs(float(u) - mac[0, k, j, i]) < 1e-6
    u, v, w = interpol_mac(m, jnp.float32(i + 0.5), jnp.float32(j),
                           jnp.float32(k + 0.5))
    assert abs(float(v) - mac[1, k, j, i]) < 1e-6
    u, v, w = interpol_mac(m, jnp.float32(i + 0.5), jnp.float32(j + 0.5),
                           jnp.float32(k))
    assert abs(float(w) - mac[2, k, j, i]) < 1e-6
