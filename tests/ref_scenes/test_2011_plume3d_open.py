"""3D buoyant plume with open/outflow boundaries vs reference-binary
goldens. Compact port of tools/tests/test_2011_plume3d_open.py — the 2010
scene plus setOpenBound on all sides and per-step resetOutflow.

NOTE resetOutflow call order matches the reference exactly (after both
advections, before wall BCs).
"""
from ref_scenes.test_2010_plume3d import scene as base_scene


def scene(dtg):
    base_scene(dtg, open_bounds=True)
