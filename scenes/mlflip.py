"""ML-FLIP end to end: generate splash training data, train the detector +
modifier net, then run FLIP with the network in the simulation loop.

Runnable equivalent of the reference tensorflow/example2_liquid pipeline
(manta_flip.py -> manta_gendata.py -> tf_train.py -> manta_mlflip.py), using
mantaflow_tpu.ml.mlflip (the net runs inside the jitted step instead of a
host TF session).

Run: PYTHONPATH=. python scenes/mlflip.py [sim_frames]"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import numpy as np

from mantaflow_tpu.core.domain import Domain
from mantaflow_tpu.ml import mlflip
from mantaflow_tpu.models import flip as fm

res = 32
n_gen_frames = 25
n_train_steps = 120
n_sim = int(sys.argv[1]) if len(sys.argv) > 1 else 10

dom = Domain(size=(res, res, res), dim=3)
params = fm.FlipParams(gravity=(0.0, -0.03, 0.0), cg_accuracy=1e-3,
                       flip_ratio=0.97)

# fast drop into a shallow basin: the impact ejects ballistic droplets,
# which become the positive splash labels (manta_flip.py-style energetic
# data-gen scene)
print(f"[1/3] generating training data ({n_gen_frames} frames @ {res}^3)...",
      flush=True)
feats, labels, modvels, _ = mlflip.generate_training_data(
    dom, params, n_frames=n_gen_frames, window=1, drop_speed=4.0)
n_splash = int((labels > 0.5).sum())
print(f"      {feats.shape[0]} surface candidates, {n_splash} splashed",
      flush=True)

print(f"[2/3] training MLFlipNet ({n_train_steps} steps)...", flush=True)
net, net_params, scale, losses = mlflip.train(
    feats, labels, modvels, hidden=32, n_steps=n_train_steps, batch=128)
print(f"      loss {np.mean(losses[:10]):.4f} -> {np.mean(losses[-10:]):.4f}",
      flush=True)

print(f"[3/3] running {n_sim} MLFLIP steps with the net in the loop...",
      flush=True)
state = mlflip.make_mlflip_state(dom, params, drop_speed=4.0)
state = mlflip.run_with_net(state, dom, params, net, net_params, scale,
                            n_steps=n_sim)
n_ind = int(((np.asarray(state.ptype) == 4)
             & np.asarray(state.parts.active_mask())).sum())
print(f"done: {int(state.parts.count)} particles, "
      f"{n_ind} ballistic (splashed), velmax="
      f"{float(np.abs(np.asarray(state.vel)).max()):.4f}", flush=True)
