"""File IO: .uni round-trips (grids, particles, pdata), obj/bobj meshes,
pytree checkpoints, PPM projection."""
import os
import numpy as np
import jax.numpy as jnp

from mantaflow_tpu import *
from mantaflow_tpu.io import uni as uio


def test_uni_grid_roundtrip(tmp_path):
    res = 12
    s = Solver(name="io", gridSize=vec3(res, res, res))
    g = s.create(RealGrid)
    rng = np.random.RandomState(0)
    g.from_numpy(rng.rand(res, res, res).astype(np.float32))
    fn = str(tmp_path / "g.uni")
    g.save(fn)
    g2 = s.create(RealGrid)
    g2.load(fn)
    np.testing.assert_array_equal(g.to_numpy(), g2.to_numpy())

    v = s.create(MACGrid)
    v.from_numpy(rng.randn(3, res, res, res).astype(np.float32))
    fnv = str(tmp_path / "v.uni")
    v.save(fnv)
    v2 = s.create(MACGrid)
    v2.load(fnv)
    np.testing.assert_array_equal(v.to_numpy(), v2.to_numpy())

    # header matches the reference layout
    data, h = uio.read_grid_uni(fnv)
    assert (h["dimX"], h["dimY"], h["dimZ"]) == (res, res, res)
    assert h["elementType"] == 2 and h["bytesPerElement"] == 12

    fl = s.create(FlagGrid)
    fl.initDomain()
    fl.fillGrid()
    fnf = str(tmp_path / "f.uni")
    fl.save(fnf)
    fl2 = s.create(FlagGrid)
    fl2.load(fnf)
    np.testing.assert_array_equal(fl.to_numpy(), fl2.to_numpy())


def test_uni_reader_matches_reference_pyreader(tmp_path):
    """Our writer's output parses with a fresh transcription of the format
    spec (readUni semantics from tensorflow/tools/uniio.py)."""
    import gzip, struct
    res = 8
    s = Solver(name="io", gridSize=vec3(res, res, res))
    g = s.create(RealGrid)
    g.from_numpy(np.arange(res**3, dtype=np.float32).reshape(res, res, res))
    fn = str(tmp_path / "ref.uni")
    g.save(fn)
    with gzip.open(fn, "rb") as f:
        assert f.read(4) == b"MNT3"
        vals = struct.unpack("iiiiii252siQ", f.read(288))
        data = np.frombuffer(f.read(), dtype=np.float32)
    assert vals[0] == vals[1] == vals[2] == res
    np.testing.assert_array_equal(
        data.reshape(res, res, res), g.to_numpy())


def test_particles_and_pdata_roundtrip(tmp_path):
    res = 12
    s = Solver(name="io", gridSize=vec3(res, res, 1), dim=2)
    flags = s.create(FlagGrid)
    flags.initDomain()
    flags.fillGrid()
    pp = s.create(BasicParticleSystem)
    sampleFlagsWithParticles(flags=flags, parts=pp, discretization=2,
                             randomness=0.3)
    pv = pp.create(PdataVec3)
    pv.data = pv.data.at[:, 1].set(-0.5)
    fn = str(tmp_path / "p.uni")
    pp.save(fn)
    fnd = str(tmp_path / "pv.uni")
    pv.save(fnd)

    pp2 = s.create(BasicParticleSystem)
    pp2.load(fn)
    assert pp2.pySize() == pp.pySize()
    np.testing.assert_allclose(pp2.to_numpy(), pp.to_numpy(), atol=1e-6)
    pv2 = pp2.create(PdataVec3)
    pv2.load(fnd)
    m = pp.pySize()
    np.testing.assert_allclose(np.asarray(pv2.data)[:m],
                               np.asarray(pv.data)[:m])


def test_mesh_obj_bobj_roundtrip(tmp_path):
    nodes = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    fo = str(tmp_path / "m.obj")
    uio.write_mesh_obj(fo, nodes, tris)
    n2, t2 = uio.read_mesh_obj(fo)
    np.testing.assert_allclose(n2, nodes)
    np.testing.assert_array_equal(t2, tris)
    fb = str(tmp_path / "m.bobj.gz")
    uio.write_mesh_bobj(fb, nodes, tris)
    n3, t3 = uio.read_mesh_bobj(fb)
    np.testing.assert_allclose(n3, nodes)
    np.testing.assert_array_equal(t3, tris)


def test_checkpoint_roundtrip(tmp_path):
    from mantaflow_tpu.core.domain import Domain
    from mantaflow_tpu.core.shapes import Sphere as CSphere
    from mantaflow_tpu.models import smoke

    dom = Domain(size=(12, 12, 12), dim=3)
    params = smoke.SmokeParams()
    st = smoke.make_smoke_state(dom, params,
                                source_shape=CSphere(center=(6, 3, 6),
                                                     radius=2))
    st = smoke.smoke_step(st, dom, params)
    fn = str(tmp_path / "ckpt.npz")
    save_checkpoint(fn, st)
    st2 = load_checkpoint(fn, st)
    np.testing.assert_array_equal(np.asarray(st.density),
                                  np.asarray(st2.density))
    # resume: stepping the restored state works
    st3 = smoke.smoke_step(st2, dom, params)
    assert np.isfinite(np.asarray(st3.density)).all()


def test_ppm_projection(tmp_path):
    res = 16
    s = Solver(name="io", gridSize=vec3(res, res, res))
    g = s.create(RealGrid)
    Sphere(s, center=vec3(8, 8, 8), radius=4).applyToGrid(grid=g, value=1.0)
    fn = str(tmp_path / "img.ppm")
    projectPpmFull(g, fn)
    with open(fn, "rb") as f:
        assert f.read(2) == b"P6"
    assert os.path.getsize(fn) > res * res * 3


def test_vol_roundtrip(tmp_path):
    """Mitsuba .vol write/read (iogrids.cpp:552/:598 layout): 48-byte VOL v3
    header, float32 payload."""
    import struct
    res = 12
    s = Solver(name="v", gridSize=vec3(res, res, res))
    g = s.create(RealGrid)
    rng = np.random.RandomState(7)
    g.from_numpy(rng.rand(res, res, res).astype(np.float32))
    p = str(tmp_path / "d.vol")
    g.save(p)

    raw = open(p, "rb").read()
    ident, ver, enc, sx, sy, sz, ch = struct.unpack_from("<3sb5i", raw, 0)
    assert (ident, ver, enc, ch) == (b"VOL", 3, 1, 1)
    assert (sx, sy, sz) == (res, res, res)
    assert len(raw) == 48 + 4 * res ** 3

    g2 = s.create(RealGrid)
    g2.load(p)
    assert np.array_equal(g2.to_numpy(), g.to_numpy())

    import pytest
    v = s.create(MACGrid)
    with pytest.raises(ValueError):
        v.save(str(tmp_path / "v.vol"))  # only Real grids, like reference


def test_vdb_grid_roundtrip(tmp_path):
    """Native .vdb IO (io/vdb.py, no pyopenvdb): Real grid, MAC grid and
    levelset round-trip exactly through the scene save/load surface."""
    res = 12  # non-multiple of the 8^3 leaf size exercises value masks
    s = Solver(name="v", gridSize=vec3(res, res, res))
    rng = np.random.RandomState(7)

    g = s.create(RealGrid)
    g.from_numpy(rng.rand(res, res, res).astype(np.float32))
    p = str(tmp_path / "d.vdb")
    g.save(p)
    g2 = s.create(RealGrid)
    g2.load(p)
    assert np.array_equal(g2.to_numpy(), g.to_numpy())

    v = s.create(MACGrid)
    v.from_numpy(rng.rand(3, res, res, res).astype(np.float32))
    pv = str(tmp_path / "v.vdb")
    v.save(pv)
    v2 = s.create(MACGrid)
    v2.load(pv)
    assert np.array_equal(v2.to_numpy(), v.to_numpy())

    from mantaflow_tpu.io import vdb
    assert vdb.read_vdb(pv)[0]["grid_class"] == vdb.CLASS_STAGGERED

    phi = s.create(LevelsetGrid)
    phi.from_numpy(rng.rand(res, res, res).astype(np.float32) - 0.5)
    pp = str(tmp_path / "phi.vdb")
    phi.save(pp)
    assert vdb.read_vdb(pp)[0]["grid_class"] == vdb.CLASS_LEVEL_SET
    phi2 = s.create(LevelsetGrid)
    phi2.load(pp)
    assert np.array_equal(phi2.to_numpy(), phi.to_numpy())


def test_vdb_multi_grid_and_int(tmp_path):
    """Multiple named grids per file + int32 grids (iovdb.cpp save() with
    a grid list); header fields survive the round trip."""
    from mantaflow_tpu.io import vdb
    rng = np.random.RandomState(11)
    d = rng.rand(20, 17, 33).astype(np.float32)
    i = rng.randint(0, 9, (20, 17, 33)).astype(np.int32)
    p = str(tmp_path / "m.vdb")
    vdb.write_vdb(p, [
        {"name": "density", "data": d, "grid_class": vdb.CLASS_FOG,
         "voxel_size": 0.25},
        {"name": "flags", "data": i},
    ])
    out = vdb.read_vdb(p)
    assert [g["name"] for g in out] == ["density", "flags"]
    assert out[0]["voxel_size"] == 0.25
    assert np.array_equal(out[0]["data"], d)
    assert np.array_equal(out[1]["data"], i)
    assert out[1]["data"].dtype == np.int32


def test_png_roundtrip(tmp_path):
    """PNG writer (simpleimage.cpp PNG-path parity): gray + RGB round-trip."""
    from mantaflow_tpu.io.png import write_png, read_png
    rng = np.random.RandomState(3)
    gray = rng.randint(0, 256, (17, 23), dtype=np.uint8)
    p = str(tmp_path / "g.png")
    write_png(p, gray)
    np.testing.assert_array_equal(read_png(p), gray)
    rgb = rng.randint(0, 256, (9, 11, 3), dtype=np.uint8)
    p2 = str(tmp_path / "c.png")
    write_png(p2, rgb)
    np.testing.assert_array_equal(read_png(p2), rgb)


def test_project_ppm_full_png(tmp_path):
    res = 8
    s = Solver(name="png", gridSize=vec3(res, res, res))
    g = s.create(RealGrid)
    g.setConst(0.5)
    from mantaflow_tpu.scene.io_api import projectPpmFull
    p = str(tmp_path / "shot.png")
    projectPpmFull(g, p, 0, 1.0)
    from mantaflow_tpu.io.png import read_png
    img = read_png(p)
    assert img.shape == (res, res, 3)
    assert (np.abs(img.astype(int) - 127) <= 1).all()
