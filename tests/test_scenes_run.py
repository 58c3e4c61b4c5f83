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
]


@pytest.mark.parametrize("scene,argv", FAST_SCENES,
                         ids=[s for s, _ in FAST_SCENES])
def test_scene_runs(scene, argv):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(SCENES_DIR, scene)] + argv,
        capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, (
        f"{scene} failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
