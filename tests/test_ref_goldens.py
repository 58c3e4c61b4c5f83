"""Run the ported reference test scenes against reference-binary goldens.

Each scene in tests/ref_scenes/ replays a reference tools/tests script's op
sequence through mantaflow_tpu; goldens in tests/testdata_ref/ came from
the reference C++ binary (see tests/refgolden.py).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from refgolden import run_ref_scene  # noqa: E402

SCENES = sorted(
    f[:-3] for f in os.listdir(os.path.join(os.path.dirname(__file__),
                                            "ref_scenes"))
    if f.startswith("test_") and f.endswith(".py"))


@pytest.mark.parametrize("scene_name", SCENES)
def test_ref_golden(scene_name):
    run_ref_scene(scene_name)
