"""Shape stamping (Sphere/Box/Cylinder onto Real+MAC grids) vs
reference-binary goldens. Compact port of tools/tests/test_0020_shapes.py.
"""
from mantaflow_tpu import *


def scene(dtg):
    res = 42
    gs = vec3(res, res, res)
    s = Solver(name='main', gridSize=gs, dim=3)
    density = s.create(RealGrid)
    vel = s.create(MACGrid)

    cases = [
        ("Sph", s.create(Sphere, center=gs * vec3(0.3, 0.4, 0.5),
                         radius=res * 0.2), 0.302,
         s.create(Sphere, center=gs * vec3(0.6, 0.5, 0.4),
                  radius=res * 0.25), vec3(0.1, 0.1, 0.4)),
        ("Box", s.create(Box, p0=gs * vec3(0.2, 0.2, 0.3),
                         p1=gs * vec3(0.9, 0.8, 0.9)), 0.812,
         s.create(Box, p0=gs * vec3(0.2, 0.2, 0.3),
                  p1=gs * vec3(0.9, 0.8, 0.9)), vec3(0.5, 0.1, 0.1)),
        ("Cyl", s.create(Cylinder, center=gs * vec3(0.5, 0.5, 0.5),
                         radius=res * 0.2, z=gs * vec3(0, 0.3, 0)), 0.432,
         s.create(Cylinder, center=gs * vec3(0.5, 0.5, 0.5),
                  radius=res * 0.2, z=gs * vec3(0, 0.3, 0)),
         vec3(0.4, 0.3, 0.2)),
    ]
    for name, shp_d, dval, shp_v, vval in cases:
        density.setConst(0.)
        vel.setConst(vec3(0, 0, 0))
        shp_d.applyToGrid(grid=density, value=dval)
        shp_v.applyToGrid(grid=vel, value=vval)
        dtg(f"dens{name}", density, 1e-07)
        dtg(f"vel{name}", vel, 1e-07)
