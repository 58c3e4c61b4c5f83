"""Inverted-expectation check vs reference-binary golden.

Compact port of tools/tests/test_0011_inverted.py: the compared grid is
deliberately wrong and the check must FAIL — exercising invertResult in the
golden harness.
"""
from mantaflow_tpu import *


def scene(dtg):
    s = Solver(name='main', gridSize=vec3(17, 177, 27), dim=3)
    dummy = s.create(RealGrid)
    dummy.setConst(-25.00)   # golden holds +25.01
    dtg("dens", dummy, 50., invert_result=True)
