"""Microbenchmark of the Pallas window-advection kernel variants on TPU.

Run: python tools/profile_window_kernel.py [res]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

from mantaflow_tpu.core.domain import Domain
from mantaflow_tpu.ops import advection_pallas as advp

res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
dom = Domain(size=(res, res, res), dim=3)
key = jax.random.PRNGKey(0)
src = jax.random.uniform(key, dom.shape, jnp.float32)
disp = (jax.random.uniform(jax.random.PRNGKey(1), (3,) + dom.shape,
                           jnp.float32) - 0.5) * 6.0
cz, cy, cx = jnp.meshgrid(*(jnp.arange(n, dtype=jnp.float32)
                            for n in dom.shape), indexing="ij")
px, py, pz = cx + disp[0], cy + disp[1], cz + disp[2]
ok = src > 0.3


def bench(name, fn, n=20):
    out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0) / n * 1000
    cells = res ** 3
    print(f"{name}: {dt:.2f} ms  ({dt*1e6/cells:.2f} ns/cell)", flush=True)


for k in (1, 2, 3):
    for bz in (4, 8, 16):
        bench(f"plain  k={k} bz={bz}",
              lambda k=k, bz=bz: advp.window_pass(src, px, py, pz, dom, k,
                                                  bz=bz))
    bench(f"minmax k={k} bz=8",
          lambda k=k: advp.window_pass(src, px, py, pz, dom, k,
                                       want_minmax=True, bz=8))
    bench(f"minmax+ok k={k} bz=8",
          lambda k=k: advp.window_pass(src, px, py, pz, dom, k, ok_mask=ok,
                                       want_minmax=True, bz=8))
