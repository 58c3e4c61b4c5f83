"""Fluid guiding (guiding_2d.py pattern): guided velocity follows the
spiral target in the weighted region while staying divergence-free."""
import numpy as np
import jax.numpy as jnp

from mantaflow_tpu import *
from mantaflow_tpu.core import flags as fl
from mantaflow_tpu.core import mac as macops
from mantaflow_tpu.core.masks import interior_mask


def test_pd_fluid_guiding_spiral():
    res = 32
    s = Solver(name="g", gridSize=vec3(res, res, 1), dim=2)
    flags = s.create(FlagGrid)
    flags.initDomain()
    flags.fillGrid()
    vel = s.create(MACGrid)
    velT = s.create(MACGrid)
    pressure = s.create(RealGrid)
    weight = s.create(RealGrid)
    weight.setConst(1.0)

    getSpiralVelocity(flags=flags, vel=velT, strength=0.5)
    assert abs(velT.to_numpy()).max() > 0.3

    PD_fluid_guiding(vel=vel, velT=velT, pressure=pressure, flags=flags,
                     weight=weight, blurRadius=2, maxIters=40)

    v = vel.to_numpy()
    t = velT.to_numpy()
    assert np.isfinite(v).all()
    # guided field correlates with the target's rotation
    m = np.asarray(fl.is_fluid(flags.data) & interior_mask(s.domain, 2))
    corr = (v[0] * t[0] + v[1] * t[1])[0][m[0]].mean()
    mag = (t[0] ** 2 + t[1] ** 2)[0][m[0]].mean()
    assert corr > 0.15 * mag  # substantial alignment with the target swirl
    # and the result is (approximately) divergence-free
    div = np.asarray(macops.neg_divergence(vel.data))
    assert np.abs(div[0][m[0]]).max() < 5e-3

    # weight ramp helper
    setGradientYWeight(W=weight, minY=0, maxY=res - 1, valAtMin=0.0,
                       valAtMax=2.0)
    w = weight.to_numpy()
    assert w[0, 0, 5] == 0.0 and abs(w[0, res - 1, 5] - 2.0) < 1e-5
