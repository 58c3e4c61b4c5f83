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
                           window: int = 2):
    """Buoyant-plume dataset: saves density/velocity/pressure per frame."""
    rng = np.random.RandomState(seed)
    dom = Domain(size=(res, int(1.5 * res), res), dim=3)
    params = sm.SmokeParams(buoyancy=(0.0, -6e-4, 0.0), window=window,
                            vorticity_confinement=0.05)
    for sim in range(num_sims):
        cx = res * (0.35 + 0.3 * rng.rand())
        cz = res * (0.35 + 0.3 * rng.rand())
        src = Sphere(center=(cx, res * 0.12, cz),
                     radius=res * (0.1 + 0.06 * rng.rand()))
        state = sm.make_smoke_state(dom, params, source_shape=src)
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
                          steps_per_frame: int = 2, seed: int = 0):
    """Breaking-dam FLIP dataset: saves levelset/velocity + particle data."""
    rng = np.random.RandomState(seed)
    dom = Domain(size=(res, res, res), dim=3)
    params = fm.FlipParams(gravity=(0.0, -0.003, 0.0), ghost_fluid=True)
    for sim in range(num_sims):
        w = 0.3 + 0.25 * rng.rand()
        h = 0.4 + 0.3 * rng.rand()
        state = fm.make_dam_state(dom, params, dam_frac=(w, h, 1.0),
                                  discretization=2,
                                  randomness=0.1 + 0.2 * rng.rand())
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
