"""Explicit / implicit 2D wave-equation solve.
Port of reference scenes/waveEquation.py:1-90 (implicit cgSolveWE path and
the explicit second-derivative path).

Run: PYTHONPATH=. python scenes/waveEquation.py [frames] [implicit=1]"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from mantaflow_tpu import *

res = 100
gs = vec3(res, res, 1)
s = Solver(name="main", gridSize=gs, dim=2)

implicit = (len(sys.argv) < 3) or (sys.argv[2] == "1")
s.timestep = 1.0
cSqr = 0.1
useCrankNicholson = False

h = s.create(RealGrid)
hprev = s.create(RealGrid)
hnew = s.create(RealGrid)

flags = s.create(FlagGrid)
curv = s.create(RealGrid)
vel = s.create(RealGrid)

flags.initDomain()
flags.fillGrid()

source = Box(s, p0=gs * vec3(0.3, 0.3, 0.3), p1=gs * vec3(0.5, 0.5, 0.5))
source.applyToGrid(grid=h, value=1)
hprev.copyFrom(h)

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
for t in range(n_frames):
    mantaMsg("\nFrame %i" % s.frame)

    mass = totalSum(height=h)

    if implicit:
        # cgSolveWE itself rotates (ut, utm1) like the reference
        # (waves.cpp:143-144) — no manual shuffle here
        cgSolveWE(flags=flags, ut=h, utm1=hprev, out=hnew, cSqr=cSqr,
                  crankNic=useCrankNicholson)
    else:
        hnew.copyFrom(h)
        calcSecDeriv2d(h, curv)
        hnew.addScaled(h, 1.0)
        hnew.addScaled(hprev, -1.0)
        hnew.addScaled(curv, cSqr * s.timestep * s.timestep)
        hprev.copyFrom(h)
        h.copyFrom(hnew)

    normalizeSumTo(h, mass)
    s.step()

mantaMsg("waveEquation done: mass %.4f, height max %.4f"
         % (totalSum(height=h), h.getMax()))
