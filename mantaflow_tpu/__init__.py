"""mantaflow_tpu — a TPU-native fluid simulation framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
mantaflow (reference: zoharl3/mantaflow): Eulerian smoke/fire/liquid solvers
on MAC grids, FLIP/APIC particle liquids, levelsets, preconditioned-CG /
multigrid pressure projection, and a mantaflow-compatible Python scene API.

Usage mirrors the reference's scene scripts:

    from mantaflow_tpu import *
    s = Solver(name='main', gridSize=vec3(64, 64, 64))
    flags = s.create(FlagGrid); ...

The functional core lives in ``mantaflow_tpu.core`` / ``.ops`` (pure
jit-compiled functions over pytrees); fused whole-step pipelines live in
``mantaflow_tpu.models``.
"""

from .scene.api import *  # noqa: F401,F403
from .scene.api import (  # explicit re-exports for linters
    Solver, FluidSolver, FlagGrid, RealGrid, IntGrid, Vec3Grid, MACGrid,
    LevelsetGrid, Box, Sphere, Cylinder, Slope, NullShape, NoiseField,
    Timings, vec3, vec3i, mantaMsg, setDebugLevel,
)
from .scene.papi import *  # noqa: F401,F403
from .scene.papi import (
    BasicParticleSystem, ParticleIndexSystem, PdataReal, PdataInt, PdataVec3,
)

from .scene.ops2 import *  # noqa: F401,F403
from .scene.zflip_api import *  # noqa: F401,F403
from .scene.mesh_api import (  # noqa: F401
    Mesh, smoothMesh, subdivideMesh, killSmallComponents,
)
from .scene.api import (  # noqa: F401
    Grid4Base, Grid4Real, Grid4Int, Grid4Vec3, Grid4Vec4, getSliceFrom4d,
    setSliceTo4d, interpolateGrid4d,
)
from .scene.timing_api import Timings, enableTimings  # noqa: F401
from .scene.vortex_api import (  # noqa: F401
    VortexParticleSystem, TurbulenceParticleSystem, VortexSheetMesh,
    VPseedK41, markAsFixed, vorticitySource, smoothVorticity, VICintegration,
    densityFromLevelset, texcoordInflow, meshSmokeInflow,
)
from .scene.io_api import (  # noqa: F401
    save, load, save_checkpoint, load_checkpoint, projectPpmFull,
)

VecGrid = Vec3Grid  # manta alias (grid.h:252)

__version__ = "0.1.0"
