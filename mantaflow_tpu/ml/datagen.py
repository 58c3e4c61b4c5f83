"""Dataset generation (mantaGen equivalent, SURVEY.md §2.11).

The reference's ``tensorflow/mantaGen/create_dataset.py`` drives scene
classes and dumps per-frame npz files in the layout
``<out>/sim_XXXXXX/<field>_YYYYYY.npz``. Here the generators drive the fused
jitted models directly (lax.scan over steps, one device round-trip per saved
frame), keeping the same on-disk layout so downstream loaders port.
"""

from __future__ import annotations

import os

import numpy as np
import jax

from ..core.domain import Domain
from ..core.shapes import Sphere
from ..models import flip as fm
from ..models import smoke as sm


def _save_fields(out_dir: str, frame: int, fields: dict):
    os.makedirs(out_dir, exist_ok=True)
    for name, arr in fields.items():
        np.savez_compressed(os.path.join(out_dir, f"{name}_{frame:06d}.npz"),
                            data=np.asarray(arr))


def generate_smoke_dataset(output_path: str, num_sims: int = 1,
                           num_frames: int = 10, res: int = 32,
                           steps_per_frame: int = 1, seed: int = 0,
                           window: int = 2, obstacles: bool = False,
                           noise_inflow: bool = False,
                           buoyancy_range=(4e-4, 9e-4)):
    """Buoyant-plume dataset: saves density/velocity/pressure per frame.

    mantaGen-style randomization (tensorflow/mantaGen/scenes/): per-sim
    random source position/radius and buoyancy strength; optional random
    interior obstacle (sphere or box stamped into the flags) and
    wavelet-noise-modulated inflow (the source emits noise-field density
    instead of constant 1 — smoke_buoyant_scene.py pattern)."""
    import dataclasses as _dc

    import jax.numpy as jnp

    from ..core import flags as fl
    from ..core.shapes import Box

    rng = np.random.RandomState(seed)
    dom = Domain(size=(res, int(1.5 * res), res), dim=3)
    base = sm.SmokeParams(buoyancy=(0.0, -6e-4, 0.0), window=window,
                          vorticity_confinement=0.05)
    for sim in range(num_sims):
        buoy = -float(rng.uniform(*buoyancy_range))
        params = _dc.replace(base, buoyancy=(0.0, buoy, 0.0))
        cx = res * (0.35 + 0.3 * rng.rand())
        cz = res * (0.35 + 0.3 * rng.rand())
        src = Sphere(center=(cx, res * 0.12, cz),
                     radius=res * (0.1 + 0.06 * rng.rand()))
        state = sm.make_smoke_state(dom, params, source_shape=src)
        if noise_inflow:
            from ..utils.noise import WaveletNoiseField
            nf = WaveletNoiseField(domain=dom,
                                   fixed_seed=int(rng.randint(1 << 30)))
            nf.pos_scale = (res / 10.0,) * 3
            sz, sy, sx = dom.shape
            pz_, py_, px_ = np.meshgrid(np.arange(sz) + 0.5,
                                        np.arange(sy) + 0.5,
                                        np.arange(sx) + 0.5, indexing="ij")
            field = np.clip(np.asarray(nf.evaluate(px_, py_, pz_)) * 1.5,
                            0.0, 1.0)
            state = _dc.replace(
                state, source=jnp.asarray(
                    np.where(np.asarray(state.source) > 0, field, 0.0)
                    .astype(np.float32)))
        if obstacles:
            if rng.rand() < 0.5:
                obs = Sphere(center=(res * (0.3 + 0.4 * rng.rand()),
                                     res * (0.5 + 0.5 * rng.rand()),
                                     res * (0.3 + 0.4 * rng.rand())),
                             radius=res * (0.08 + 0.08 * rng.rand()))
            else:
                p0 = np.array([res * (0.2 + 0.3 * rng.rand()),
                               res * (0.4 + 0.4 * rng.rand()),
                               res * (0.2 + 0.3 * rng.rand())])
                p1 = p0 + res * (0.1 + 0.15 * rng.rand(3))
                obs = Box(p0=tuple(p0), p1=tuple(p1))
            new_flags = jnp.where(obs.inside_grid(dom),
                                  jnp.int32(fl.TypeObstacle), state.flags)
            state = _dc.replace(state, flags=new_flags)
        out_dir = os.path.join(output_path, f"sim_{sim:06d}")
        for frame in range(num_frames):
            state = sm.smoke_run(state, dom, params, steps_per_frame)
            _save_fields(out_dir, frame, {
                "density": state.density,
                "vel": state.vel,
                "pressure": state.pressure,
            })
    return output_path


def generate_flip_dataset(output_path: str, num_sims: int = 1,
                          num_frames: int = 10, res: int = 32,
                          steps_per_frame: int = 2, seed: int = 0,
                          obstacles: bool = False,
                          gravity_range=(2e-3, 4e-3)):
    """Breaking-dam FLIP dataset: saves levelset/velocity + particle data.

    mantaGen flip_scene.py-style randomization: dam extents, sampling
    jitter, gravity strength; with ``obstacles`` a random interior sphere
    obstacle is stamped (flip06_obstacle.py pattern)."""
    rng = np.random.RandomState(seed)
    dom = Domain(size=(res, res, res), dim=3)
    for sim in range(num_sims):
        params = fm.FlipParams(
            gravity=(0.0, -float(rng.uniform(*gravity_range)), 0.0),
            ghost_fluid=True)
        w = 0.3 + 0.25 * rng.rand()
        h = 0.4 + 0.3 * rng.rand()
        obstacle = None
        if obstacles:
            obstacle = Sphere(center=(res * (0.55 + 0.25 * rng.rand()),
                                      res * (0.15 + 0.25 * rng.rand()),
                                      res * (0.3 + 0.4 * rng.rand())),
                              radius=res * (0.08 + 0.08 * rng.rand()))
        state = fm.make_dam_state(dom, params, dam_frac=(w, h, 1.0),
                                  discretization=2,
                                  randomness=0.1 + 0.2 * rng.rand(),
                                  obstacle=obstacle)
        out_dir = os.path.join(output_path, f"sim_{sim:06d}")
        for frame in range(num_frames):
            state = fm.flip_run(state, dom, params, steps_per_frame)
            act = np.asarray(state.parts.active_mask())
            _save_fields(out_dir, frame, {
                "phi": state.phi,
                "vel": state.vel,
                "pressure": state.pressure,
                "parts": np.asarray(state.parts.pos)[act],
                "pvel": np.asarray(state.pvel)[act],
            })
    return output_path


def load_dataset(path: str, field: str):
    """fluiddataloader-style loader: stacks <field>_*.npz across sims/frames."""
    sims = sorted(d for d in os.listdir(path) if d.startswith("sim_"))
    out = []
    for s in sims:
        frames = sorted(f for f in os.listdir(os.path.join(path, s))
                        if f.startswith(field + "_"))
        out.append([np.load(os.path.join(path, s, f))["data"]
                    for f in frames])
    return out


def create_tiles(data, tile_size: int, stride: int | None = None):
    """tilecreator-style patch extraction for CNN training: [z,y,x] or
    [c,z,y,x] array -> (N, tile, tile[, tile], c) patches."""
    arr = np.asarray(data)
    if arr.ndim == 3:
        arr = arr[None]
    c = arr.shape[0]
    stride = stride or tile_size
    _, sz, sy, sx = arr.shape
    tiles = []
    for z0 in range(0, sz - tile_size + 1, stride):
        for y0 in range(0, sy - tile_size + 1, stride):
            for x0 in range(0, sx - tile_size + 1, stride):
                tiles.append(np.moveaxis(
                    arr[:, z0:z0 + tile_size, y0:y0 + tile_size,
                        x0:x0 + tile_size], 0, -1))
    return np.stack(tiles) if tiles else np.zeros(
        (0, tile_size, tile_size, tile_size, c), arr.dtype)
