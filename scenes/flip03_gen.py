"""FLIP surface-mesh creation from saved particle data (no simulation):
reads parts_%04d.uni written by flip02_surface.py (MANTA_SAVE_PARTS=1) and
writes upres .bobj.gz surfaces. Port of reference scenes/flip03_gen.py:1-130.

Run: MANTA_OUT=/tmp/flip02_out PYTHONPATH=. python scenes/flip03_gen.py
     [endFrame] [method]"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from mantaflow_tpu import *
from mantaflow_tpu.io.uni import get_uni_file_size

out = os.environ.get("MANTA_OUT", "/tmp/flip02_out").rstrip("/") + "/"

# surfacing method: 0=simple union, 1=averaged, 2=improved averaging
method = int(sys.argv[2]) if len(sys.argv) > 2 else 2

partfile = "parts_%04d.uni"
startFrame = 0
endFrame = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
interval = 1
upres = 2.0
meshfile = out + "fluidsurface_final_%04d.bobj.gz"

refName = out + "ref_" + (partfile % 0)
gs = get_uni_file_size(refName)
if gs[0] <= 0:
    mantaMsg("Warning! File '%s' not found, cannot determine size...\n"
             % refName, 0)
    sys.exit(1)

gs = vec3(int(gs[0] * upres), int(gs[1] * upres), int(gs[2] * upres))
s = Solver(name="main", gridSize=gs, dim=3)

radiusFactor = 2.5
outCnt = 0
frame = startFrame

flags = s.create(FlagGrid)
phi = s.create(LevelsetGrid)
pp = s.create(BasicParticleSystem)
mesh = s.create(Mesh)

pindex = s.create(ParticleIndexSystem)
gpi = s.create(IntGrid)

flags.initDomain(boundaryWidth=0)

while frame < endFrame:
    meshfileCurr = meshfile % outCnt
    mantaMsg("Frame %d " % frame)
    phi.setBound(value=0.0, boundaryWidth=1)

    if os.path.isfile(meshfileCurr):
        mesh.load(meshfileCurr)
    elif os.path.isfile(out + partfile % frame):
        pp.load(out + partfile % frame)
        # particle positions were saved in the SIM's grid space; surface
        # extraction runs on the upres grid
        pp.multScalePos(upres)

        gridParticleIndex(parts=pp, flags=flags, indexSys=pindex, index=gpi)
        if method == 0:
            unionParticleLevelset(pp, pindex, flags, gpi, phi, radiusFactor)
        elif method == 1:
            averagedParticleLevelset(pp, pindex, flags, gpi, phi,
                                     radiusFactor, 1, 1)
        elif method == 2:
            improvedParticleLevelset(pp, pindex, flags, gpi, phi,
                                     radiusFactor, 1, 1, 0.4, 3.5)
        else:
            print("Error - unknown method")
            sys.exit(1)

        phi.setBound(value=0.0, boundaryWidth=1)
        phi.createMesh(mesh)
        mesh.save(meshfileCurr)
    else:
        break

    outCnt += 1
    frame += interval
    s.step()

mantaMsg("flip03_gen done: %d meshes written" % outCnt)
