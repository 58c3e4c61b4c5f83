"""Device-mesh sharding for simulation state.

The reference is shared-memory-only (SURVEY.md §2.16); the TPU-native
equivalent of its threading layer is SPMD over a ``jax.sharding.Mesh``:
grids shard along the z (and y) axes, stencil shifts lower to XLA collective
permutes over ICI, and the CG dot products / max-norms become psums — all
inserted by GSPMD from sharding annotations, no explicit communication code.

A single device is the degenerate mesh, so the same step function serves
1..N chips unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_names=("z", "y")) -> Mesh:
    """Build a mesh over available devices, factored across the named axes
    (z outermost). For n=8 and two axes this gives a 4x2 (z,y) mesh."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if len(axis_names) == 1:
        shape = (n_devices,)
    else:
        # factor n into two axes, largest factor on z
        a = int(np.floor(np.sqrt(n_devices)))
        while n_devices % a:
            a -= 1
        shape = (n_devices // a, a)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names[:len(shape)])


def scalar_grid_spec(mesh: Mesh) -> P:
    """[z, y, x] grid: shard z (and y), keep x (lanes) replicated-contiguous."""
    if len(mesh.axis_names) == 1:
        return P("z", None, None)
    return P("z", "y", None)


def mac_grid_spec(mesh: Mesh) -> P:
    if len(mesh.axis_names) == 1:
        return P(None, "z", None, None)
    return P(None, "z", "y", None)


def shard_smoke_state(state, mesh: Mesh):
    """Place a SmokeState's arrays on the mesh with grid shardings."""
    gs = NamedSharding(mesh, scalar_grid_spec(mesh))
    ms = NamedSharding(mesh, mac_grid_spec(mesh))
    rep = NamedSharding(mesh, P())

    def place(x):
        if not hasattr(x, "ndim"):
            return x
        if x.ndim == 3:
            return jax.device_put(x, gs)
        if x.ndim == 4:
            return jax.device_put(x, ms)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, state)


def particle_spec(mesh: Mesh) -> P:
    """(N, ...) particle arrays: shard the particle axis over ALL mesh
    devices (data-parallel particles).

    v1 strategy (SURVEY §2.16): grids are z/y domain-decomposed while
    particles are N-sharded; GSPMD inserts the p2g partial-grid psums and
    the g2p grid all-gathers. Cell-block particle placement (sorting
    particles into the grid shards that own their cells, making p2g/g2p
    local) is the planned refinement once transfers dominate profiles.
    """
    axes = tuple(mesh.axis_names)
    return P(axes if len(axes) > 1 else axes[0])


def shard_flip_state(state, mesh: Mesh):
    """Place a FlipState on the mesh: grids domain-decomposed (z/y),
    particle arrays N-sharded, time state replicated."""
    import dataclasses
    gs = NamedSharding(mesh, scalar_grid_spec(mesh))
    ms = NamedSharding(mesh, mac_grid_spec(mesh))
    rep = NamedSharding(mesh, P())
    paxes = particle_spec(mesh)
    p2 = NamedSharding(mesh, P(*([paxes[0]] + [None])))
    p1 = NamedSharding(mesh, paxes)

    def place_parts(parts):
        return dataclasses.replace(
            parts,
            pos=jax.device_put(parts.pos, p2),
            flags=jax.device_put(parts.flags, p1),
            count=jax.device_put(parts.count, rep))

    def place_ts(ts):
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), ts)

    return dataclasses.replace(
        state,
        flags=jax.device_put(state.flags, gs),
        vel=jax.device_put(state.vel, ms),
        vel_old=jax.device_put(state.vel_old, ms),
        pressure=jax.device_put(state.pressure, gs),
        phi=jax.device_put(state.phi, gs),
        parts=place_parts(state.parts),
        pvel=jax.device_put(state.pvel, p2),
        cpx=jax.device_put(state.cpx, p2),
        cpy=jax.device_put(state.cpy, p2),
        cpz=jax.device_put(state.cpz, p2),
        ts=place_ts(state.ts))


def shard_flip_bucket_state(state, mesh: Mesh):
    """Place a FlipBucketState on the mesh: grids z/y domain-decomposed,
    bucket (PPC, T) arrays sharded along the flat-cell axis T over ALL mesh
    devices. T is z-major (x fastest), so an all-device split of T is a
    contiguous z-slab decomposition aligned with the grid sharding: the
    rebin/transfer rolls (offsets <= sy*sx) only communicate at slab faces,
    which GSPMD lowers to neighbor collective-permutes over ICI."""
    import dataclasses
    gs = NamedSharding(mesh, scalar_grid_spec(mesh))
    ms = NamedSharding(mesh, mac_grid_spec(mesh))
    rep = NamedSharding(mesh, P())
    axes = tuple(mesh.axis_names)
    bspec = NamedSharding(mesh, P(None, axes if len(axes) > 1 else axes[0]))

    def place_buckets(bk):
        return dataclasses.replace(
            bk,
            px=jax.device_put(bk.px, bspec), py=jax.device_put(bk.py, bspec),
            pz=jax.device_put(bk.pz, bspec), vx=jax.device_put(bk.vx, bspec),
            vy=jax.device_put(bk.vy, bspec), vz=jax.device_put(bk.vz, bspec),
            valid=jax.device_put(bk.valid, bspec),
            dropped=jax.device_put(bk.dropped, rep))

    def place_ts(ts):
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), ts)

    return dataclasses.replace(
        state,
        flags=jax.device_put(state.flags, gs),
        vel=jax.device_put(state.vel, ms),
        vel_old=jax.device_put(state.vel_old, ms),
        pressure=jax.device_put(state.pressure, gs),
        phi=jax.device_put(state.phi, gs),
        buckets=place_buckets(state.buckets),
        ts=place_ts(state.ts),
        blend_pending=jax.device_put(state.blend_pending, rep))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
