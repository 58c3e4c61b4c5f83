"""Every scene file under scenes/ runs headless for a few frames.

The reference's scene scripts are its user-facing surface; this guards
that each port at least executes end-to-end (physics is covered by the
golden and op-level tests).
"""
import os
import subprocess
import sys

import pytest

SCENES_DIR = os.path.join(os.path.dirname(__file__), "..", "scenes")

# (scene, argv) — short configs; heavy scenes get tiny frame counts
FAST_SCENES = [
    ("fire.py", ["4"]),
    ("surfaceTension.py", ["3"]),
    ("movingObstacle.py", ["6"]),
    ("meshload.py", ["3"]),
    ("guiding_2d.py", ["3"]),
    ("turbulence.py", ["3"]),
    ("lidDrivenCavity.py", ["6"]),
    ("idp_apic01_simple.py", ["5"]),
    ("benchmark_dam.py", ["10", "0.1"]),
    ("benchmark_wave.py", ["0.1"]),
    ("zflip.py", ["1", "5", "20"]),
    ("flip02_surface.py", ["4"]),
    ("simpleplume.py", ["4"]),
    ("plume_adaptDt.py", ["3"]),
    ("apic01_simple.py", ["6"]),
    ("waveEquation.py", ["8"]),
    ("numpy_array_simple.py", ["4"]),
    ("numpy_write_read.py", ["2"]),
    ("flip04_adaptDt.py", ["2", "32"]),
    ("flip05_nbflip.py", ["2", "32"]),
    ("flip06_obstacle.py", ["2", "32"]),
    ("surfaceTurbulence.py", ["2"]),
    ("waveletTurbulenceObs.py", ["2"]),
    ("guiding_3d01_low.py", ["2"]),
    ("idp_apic02_3d.py", ["2", "32"]),
]


def _cpu_env():
    """Subprocess env that REALLY selects the CPU backend: JAX_PLATFORMS=cpu
    alone is not enough — the axon sitecustomize on PYTHONPATH registers the
    TPU plugin at interpreter start and pins the backend, so scene
    subprocesses would silently run over the (flaky) TPU tunnel. Strip the
    sitecustomize dir from PYTHONPATH (scenes add the repo to sys.path
    themselves)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    return env


@pytest.mark.parametrize("scene,argv", FAST_SCENES,
                         ids=[s for s, _ in FAST_SCENES])
def test_scene_runs(scene, argv):
    env = _cpu_env()
    r = subprocess.run(
        [sys.executable, os.path.join(SCENES_DIR, scene)] + argv,
        capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, (
        f"{scene} failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")


def test_flip02_to_flip03_gen_pipeline(tmp_path):
    """flip02 (MANTA_SAVE_PARTS=1) -> flip03_gen surface generation chain:
    particle .uni files round-trip into upres .bobj.gz meshes."""
    env = _cpu_env()
    env["MANTA_OUT"] = str(tmp_path)
    env["MANTA_SAVE_PARTS"] = "1"
    r = subprocess.run(
        [sys.executable, os.path.join(SCENES_DIR, "flip02_surface.py"), "2"],
        capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    env.pop("MANTA_SAVE_PARTS")
    r = subprocess.run(
        [sys.executable, os.path.join(SCENES_DIR, "flip03_gen.py"), "2"],
        capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "fluidsurface_final_0000.bobj.gz").exists()
    assert (tmp_path / "fluidsurface_final_0001.bobj.gz").exists()
