"""Judge repro: shard-local packing dp step abort (tests/test_parallel.py:286).

Root cause (round 5): not a program bug — XLA:CPU's stuck-collective
watchdog SIGABRTs a legitimately-slow 8-virtual-device all-reduce on this
1-core host.  Widen the watchdog (as tests/conftest.py does) and the step
completes."""
import sys

from __graft_entry__ import _widen_cpu_collective_watchdog

_widen_cpu_collective_watchdog()

import numpy as np
import jax

from din_tpu.config import Config
from din_tpu.data.synthetic import SyntheticDataset
from din_tpu.models.registry import build_model
from din_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from din_tpu.train.engine import TrainState, init_model, make_train_step
from din_tpu.train.optim import make_optimizer

mode = sys.argv[1] if len(sys.argv) > 1 else "auto"
data_ax = int(sys.argv[2]) if len(sys.argv) > 2 else 8
model_ax = int(sys.argv[3]) if len(sys.argv) > 3 else 1

cfg = Config("volleyball").replace(
    training_stage=2, inference_module_name="dynamic_volleyball",
    data_path="synthetic", backbone="vgg16", image_size=(64, 96),
    out_size=(2, 3), emb_features=512, num_frames=2, num_boxes=12,
    num_features_boxes=32, num_features_gcn=32, lite_dim=None,
    ST_kernel_size=((3, 3),), sampling_ratio=[1], beta_factor=False,
    batch_size=8, compute_dtype="float32", train_backbone=True,
    frame_chunk=8, mesh_shape={"data": data_ax, "model": model_ax},
    shard_local_chunks=mode)

ds = SyntheticDataset(cfg, size=8)
samples = [ds[i] for i in range(8)]
batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
model = build_model(cfg)
variables = init_model(cfg, model, batch)
tx = make_optimizer(cfg, variables["params"])
state = TrainState(params=variables["params"],
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(variables["params"]),
                   rng=jax.random.PRNGKey(3))

mesh = make_mesh(cfg)
with jax.set_mesh(mesh):
    state_r = jax.device_put(state, replicated_sharding(mesh))
    batch_s = jax.device_put(batch, batch_sharding(mesh))
    step = make_train_step(model, cfg, tx, frame0_labels=True,
                           has_bn=False, donate=False)
    new_s, m_s = step(state_r, batch_s)
    jax.block_until_ready(m_s["loss"])
    print("OK", mode, data_ax, model_ax, float(m_s["loss"]))
