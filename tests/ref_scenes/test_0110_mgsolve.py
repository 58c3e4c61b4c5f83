"""3D multigrid pressure solves vs reference-binary goldens.

Compact port of tools/tests/test_0110_mgsolve.py: three solves with
PcMGDynamic / PcMGStatic preconditioning (static reused across two
solves), zero-pressure fixing on.

Thresholds are loosened vs the reference's 1e-4: the goldens are the
reference CG iterate at residual 1e-4, and with a redesigned MG
preconditioner (Jacobi V-cycles vs serial GS) our iterate at the same
residual differs by the golden's own distance from the true solution.
Converging our solver to 1e-6 approaches the goldens to ~1.7e-4 (p) /
9e-5 (v) — the plateau is the reference's remaining error, so thresholds
below that are unreachable in principle; values here are ~2x the diff
observed at the reference's own accuracy setting.
"""
from mantaflow_tpu import *


def scene(dtg):
    res = 52
    gs = vec3(res, res, res)
    s = Solver(name='main', gridSize=gs, dim=3)
    s.timestep = 1.0

    flags = s.create(FlagGrid)
    vel = s.create(MACGrid)
    pressure = s.create(RealGrid)
    flags.initDomain()
    flags.fillGrid()

    velSource = s.create(Box, p0=gs * vec3(0.3, 0.4, 0.3),
                         p1=gs * vec3(0.7, 0.8, 0.7))

    # MG dynamic, no wall bcs
    vel.setConst(vec3(0, 0, 0))
    velSource.applyToGrid(grid=vel, value=vec3(0.15, 0.3, 0.21))
    solvePressure(flags=flags, vel=vel, pressure=pressure, cgMaxIterFac=99,
                  cgAccuracy=1e-04, zeroPressureFixing=True, preconditioner=2)
    s.step()
    dtg("p0", pressure, 2e-03)
    dtg("v0", vel, 1e-03)

    # second solve, with BCs
    vel.setConst(vec3(0, 0, 0))
    velSource.applyToGrid(grid=vel, value=vec3(1.5, 3, 2.1))
    setWallBcs(flags=flags, vel=vel)
    solvePressure(flags=flags, vel=vel, pressure=pressure, cgMaxIterFac=99,
                  cgAccuracy=1e-04, zeroPressureFixing=True,
                  preconditioner=PcMGDynamic)
    s.step()
    dtg("p1", pressure, 1.2e-02)
    dtg("v1", vel, 6e-03)

    # third + fourth solve, static MG (operator cached across solves)
    vel.setConst(vec3(0, 0, 0))
    velSource.applyToGrid(grid=vel, value=vec3(1.1, 2, -2.1))
    setWallBcs(flags=flags, vel=vel)
    solvePressure(flags=flags, vel=vel, pressure=pressure, cgMaxIterFac=99,
                  cgAccuracy=1e-04, zeroPressureFixing=True,
                  preconditioner=PcMGStatic)
    s.step()
    velSource.applyToGrid(grid=vel, value=vec3(-1.1, -2, 2.1))
    setWallBcs(flags=flags, vel=vel)
    solvePressure(flags=flags, vel=vel, pressure=pressure, cgMaxIterFac=99,
                  cgAccuracy=1e-04, zeroPressureFixing=True,
                  preconditioner=PcMGStatic)
    s.step()
    dtg("p2", pressure, 2e-02)
    dtg("v2", vel, 7e-03)
