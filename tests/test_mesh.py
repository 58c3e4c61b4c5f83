"""Mesh subsystem: surface extraction, advection, mesh<->grid, topology ops."""
import numpy as np

from mantaflow_tpu import *
from mantaflow_tpu.core import mesh as cmesh


def test_marching_tets_sphere():
    res = 32
    s = Solver(name="m", gridSize=vec3(res, res, res))
    phi = Sphere(s, center=vec3(16, 16, 16), radius=8).computeLevelset()
    mesh = s.create(Mesh)
    phi.createMesh(mesh)
    assert mesh.numTris() > 100
    # vertices lie near the sphere surface
    r = np.linalg.norm(mesh.nodes - 16.0, axis=1)
    assert abs(r.mean() - 8.0) < 0.2
    assert np.percentile(np.abs(r - 8.0), 95) < 0.5
    # watertight-ish: surface area near analytic 4*pi*r^2
    a, b, c = (mesh.nodes[mesh.tris[:, i]] for i in range(3))
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()
    assert abs(area - 4 * np.pi * 64) / (4 * np.pi * 64) < 0.15


def test_mesh_advect_and_io(tmp_path):
    res = 16
    s = Solver(name="m", gridSize=vec3(res, res, res))
    s.timestep = 1.0
    phi = Sphere(s, center=vec3(8, 8, 8), radius=4).computeLevelset()
    mesh = s.create(Mesh)
    phi.createMesh(mesh)
    vel = s.create(MACGrid)
    vel.setConst(vec3(0.5, 0, 0))
    flags = s.create(FlagGrid)
    flags.initDomain()
    flags.fillGrid()
    x0 = mesh.nodes[:, 0].mean()
    mesh.advectInGrid(flags=flags, vel=vel, integrationMode=IntRK4)
    # the zl fork's RK4 weights are (2,2,2,1)/6 (integrator.h:53-72), so a
    # constant field advances 7/6 * v * dt
    assert abs(mesh.nodes[:, 0].mean() - x0 - 0.5 * 7 / 6) < 0.05

    fn = str(tmp_path / "m.bobj.gz")
    mesh.save(fn)
    m2 = s.create(Mesh)
    m2.load(fn)
    assert m2.numTris() == mesh.numTris()


def test_mesh_to_levelset_roundtrip():
    """shape -> mesh -> levelset reproduces the inside region."""
    res = 24
    s = Solver(name="m", gridSize=vec3(res, res, res))
    ball = Sphere(s, center=vec3(12, 12, 12), radius=5)
    phi0 = ball.computeLevelset()
    mesh = s.create(Mesh)
    phi0.createMesh(mesh)
    phi1 = s.create(LevelsetGrid)
    mesh.computeLevelset(phi1)
    a = phi0.to_numpy() < 0
    b = phi1.to_numpy() < 0
    iou = (a & b).sum() / max((a | b).sum(), 1)
    assert iou > 0.85


def test_topology_ops():
    res = 24
    s = Solver(name="m", gridSize=vec3(res, res, res))
    phi = Sphere(s, center=vec3(8, 12, 12), radius=4).computeLevelset()
    phi2 = Sphere(s, center=vec3(18, 12, 12), radius=1.2).computeLevelset()
    phi.join(phi2)
    mesh = s.create(Mesh)
    phi.createMesh(mesh)
    t0 = mesh.numTris()
    killSmallComponents(mesh, elements=300)
    assert 0 < mesh.numTris() < t0  # the small blob was removed

    smoothMesh(mesh, strength=1.0, steps=2)
    assert np.isfinite(mesh.nodes).all()

    n0 = mesh.numNodes()
    subdivideMesh(mesh, maxLength=0.7)
    assert mesh.numNodes() > n0


def test_edge_collapse():
    res = 24
    s = Solver(name="m", gridSize=vec3(res, res, res))
    phi = Sphere(s, center=vec3(12, 12, 12), radius=6).computeLevelset()
    mesh = s.create(Mesh)
    phi.createMesh(mesh)
    n0, t0 = mesh.numNodes(), mesh.numTris()

    # collapsing short edges coarsens the mesh but keeps it a valid sphere
    subdivideMesh(mesh, minAngle=0.01, minLength=0.8, maxLength=100.0)
    assert mesh.numNodes() < n0
    assert mesh.numTris() < t0
    assert mesh.numTris() > 50
    assert mesh.tris.min() >= 0 and mesh.tris.max() < mesh.numNodes()
    # no degenerate triangles survive
    t = mesh.tris
    assert ((t[:, 0] != t[:, 1]) & (t[:, 1] != t[:, 2])
            & (t[:, 2] != t[:, 0])).all()
    # geometry preserved: vertices still near the sphere
    r = np.linalg.norm(mesh.nodes - 12.0, axis=1)
    assert abs(r.mean() - 6.0) < 0.3

    # collapse then re-split round trip stays finite and bounded
    subdivideMesh(mesh, minLength=0.5, maxLength=0.9)
    assert np.isfinite(mesh.nodes).all()
    e = mesh.nodes[mesh.tris]
    lens = np.linalg.norm(e[:, 0] - e[:, 1], axis=1)
    assert lens.max() < 2.0


def test_mesh_data_channels(tmp_path):
    """MeshDataImpl equivalent: per-node channels track topology and save."""
    from mantaflow_tpu.scene.mesh_api import MdataReal, MdataVec3, MdataInt
    res = 24
    s = Solver(name="m", gridSize=vec3(res, res, res))
    phi = Sphere(s, center=vec3(12, 12, 12), radius=5).computeLevelset()
    mesh = s.create(Mesh)
    phi.createMesh(mesh)

    md = mesh.create(MdataReal)
    mv = mesh.create(MdataVec3)
    mi = mesh.create(MdataInt)
    assert md.size() == mesh.numNodes()
    md.setConst(2.5)
    mv.setConst(1.0)
    mi.setConst(3)
    md.multConst(2.0)
    assert md.getMaxAbs() == 5.0
    assert abs(mv.getMaxAbs() - np.sqrt(3.0)) < 1e-6

    # channels re-sync after topology changes
    n0 = mesh.numNodes()
    subdivideMesh(mesh, maxLength=0.8)
    assert mesh.numNodes() > n0
    assert md.size() == mesh.numNodes()
    assert md.data[:n0].max() == 5.0  # old values kept

    p = str(tmp_path / "md.uni")
    md.save(p)
    md2 = mesh.create(MdataReal)
    md2.load(p)
    assert np.array_equal(md2.data, md.data)


def test_collide_mesh():
    """Shape.collideMesh (shapes.cpp:106-131): nodes inside the shape get
    pushed to >= margin outside, and are flagged NfCollide|NfMarked."""
    from mantaflow_tpu.scene.api import Solver, Sphere, vec3
    from mantaflow_tpu.scene.mesh_api import Mesh
    import numpy as np

    s = Solver(name="cm", gridSize=vec3(32, 32, 32))
    sph = Sphere(s, center=vec3(16, 16, 16), radius=6)
    m = Mesh(s)
    # a small triangle: one node inside (off-center, so the levelset
    # gradient is well defined), one at the surface, one far out
    m.nodes = np.array([[18.0, 16.0, 16.0],
                        [22.5, 16.0, 16.0],
                        [28.0, 16.0, 16.0]], np.float32)
    m.tris = np.array([[0, 1, 2]], np.int32)
    sph.collideMesh(m)
    phi = np.asarray(sph.shape.compute_levelset(s.domain))
    from mantaflow_tpu.core.interp import interpol
    d = np.asarray(interpol(phi, m.nodes[:, 0], m.nodes[:, 1],
                            m.nodes[:, 2]))
    assert d[0] >= 0.15            # pushed out (10 iters from the center)
    assert d[2] > 5.0              # far node untouched
    assert m.node_flags[0] & 8     # NfCollide
    assert not (m.node_flags[2] & 8)


def test_marching_cubes_watertight_sphere():
    """Generated MC table (mcubes.h equivalent): sphere surface is closed,
    consistently wound, Euler characteristic 2, outward normals."""
    from mantaflow_tpu.core.mesh import marching_cubes
    n = 32
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) + 0.5
    phi = np.sqrt((x - 16) ** 2 + (y - 16) ** 2 + (z - 16) ** 2) - 9.0
    nodes, tris = marching_cubes(phi)
    assert len(tris) > 500
    edges = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]],
                            tris[:, [2, 0]]])
    ek = np.sort(edges, axis=1)
    uniq, cnt = np.unique(ek, axis=0, return_counts=True)
    assert (cnt == 2).all()                        # watertight
    assert len(nodes) - len(uniq) + len(tris) == 2  # Euler genus 0
    du, dc = np.unique(edges, axis=0, return_counts=True)
    assert dc.max() == 1                           # consistent winding
    v0, v1, v2 = nodes[tris[:, 0]], nodes[tris[:, 1]], nodes[tris[:, 2]]
    nrm = np.cross(v1 - v0, v2 - v0)
    cen = (v0 + v1 + v2) / 3 - 16.5
    assert (np.sum(nrm * cen, axis=1) > 0).all()   # outward
    r = np.linalg.norm(nodes - 16.5, axis=1)
    assert abs(r.mean() - 9.0) < 0.1


def test_marching_cubes_interior_watertight_random():
    """Ambiguity resolution is face-consistent: no interior cracks even on
    random fields (only border-exit edges may be open)."""
    from mantaflow_tpu.core.mesh import marching_cubes
    rng = np.random.RandomState(7)
    phi = rng.randn(10, 10, 10).astype(np.float32)
    nodes, tris = marching_cubes(phi)
    edges = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]],
                            tris[:, [2, 0]]])
    ek = np.sort(edges, axis=1)
    uniq, cnt = np.unique(ek, axis=0, return_counts=True)
    open_edges = uniq[cnt != 2]
    p = nodes[open_edges.reshape(-1)]
    assert ((p <= 1.0) | (p >= 8.0)).any(axis=1).all()


def test_marching_cubes_matches_reference_binary():
    """Bit-parity with the reference binary's createMesh: identical vertex
    set (1.4e-3 cells) AND identical oriented triangles on a two-sphere
    blob levelset (goldens generated by the locally built binary)."""
    import os
    from mantaflow_tpu.core.mesh import marching_cubes
    from mantaflow_tpu.io.uni import read_grid_uni, read_mesh_obj
    d = os.path.join(os.path.dirname(__file__), "testdata_ref")
    phi, _ = read_grid_uni(os.path.join(d, "mc_blob_phi.uni"))
    nodes, tris = marching_cubes(np.asarray(phi))
    rn, rt = read_mesh_obj(os.path.join(d, "mc_blob_ref.obj"))
    assert len(nodes) == len(rn) and len(tris) == len(rt)
    # the binary saves obj in centered world coords: (grid - gs/2) * dx
    cand = (nodes - 16.0) / 32.0
    d2 = ((cand[None, :, :] - rn[:, None, :]) ** 2).sum(-1)
    nn = np.sqrt(d2.min(axis=1))
    assert nn.max() * 32 < 5e-3  # vertices identical to float noise
    ours_of_ref = d2.argmin(axis=1)
    assert len(set(ours_of_ref.tolist())) == len(rn)  # bijection
    ref_of_ours = np.empty(len(nodes), int)
    ref_of_ours[ours_of_ref] = np.arange(len(rn))
    mapped = ref_of_ours[tris]

    def cyc(t):
        i = int(np.argmin(t))
        return (t[i], t[(i + 1) % 3], t[(i + 2) % 3])

    A = set(cyc(t) for t in mapped)
    B = set(cyc(t) for t in np.asarray(rt))
    assert A == B  # identical oriented triangulation


def test_mesh_transforms_vs_binary():
    """rotate/scale/offset + computeVelocity + vertex normals + bobj world
    round-trip vs reference-binary dumps (mesh.cpp:320-399,604-622;
    iomeshes.cpp writeBobjFile). Goldens: a 24^3 sphere mesh transformed by
    offset(-c), rotate(0.3,-0.7,1.1), scale(1.1,0.9,1.0), offset(c+0.5)."""
    import os
    from mantaflow_tpu.io.uni import (read_mesh_bobj, read_grid_uni,
                                      compute_vertex_normals)
    d = os.path.join(os.path.dirname(__file__), "testdata_ref")
    gs = (24, 24, 24)
    s = Solver(name="mx", gridSize=vec3(*gs))
    mesh = s.create(Mesh)
    mesh.load(os.path.join(d, "meshxf_in.bobj.gz"))
    old = s.create(Mesh)
    old.load(os.path.join(d, "meshxf_in.bobj.gz"))

    mesh.offset(vec3(-12, -12, -12))
    mesh.rotate(vec3(0.3, -0.7, 1.1))
    mesh.scale(vec3(1.1, 0.9, 1.0))
    mesh.offset(vec3(12.5, 12.5, 12.5))

    rn, rt, rnorm = read_mesh_bobj(os.path.join(d, "meshxf_out.bobj.gz"),
                                   grid_size=gs, return_normals=True)
    assert mesh.numNodes() == len(rn)
    assert np.abs(mesh.nodes - rn).max() < 1e-5
    ours_norm = compute_vertex_normals(mesh.nodes, mesh.tris)
    assert np.abs(ours_norm - rnorm).max() < 1e-5

    vel = s.create(MACGrid)
    mesh.computeVelocity(old, vel)
    ref_vel, _ = read_grid_uni(os.path.join(d, "meshxf_vel.uni"))
    assert np.abs(np.asarray(vel.data) - ref_vel).max() < 1e-4

    # save_pos / load_pos (mesh.cpp:320-330)
    mesh.save_pos()
    saved = mesh.nodes.copy()
    mesh.offset(vec3(1, 2, 3))
    mesh.load_pos()
    assert np.array_equal(mesh.nodes, saved)
