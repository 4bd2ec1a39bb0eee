"""Multi-device data-parallel training on the 8-device virtual CPU mesh:
the sharded step must produce the same update as single-device."""

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
import numpy as np
import pytest

from din_tpu.config import Config
from din_tpu.data.synthetic import SyntheticDataset
from din_tpu.models.registry import build_model
from din_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                   replicated_sharding)
from din_tpu.train.engine import TrainState, init_model, make_train_step
from din_tpu.train.optim import make_optimizer

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _setup():
    cfg = Config("volleyball").replace(
        training_stage=2, inference_module_name="dynamic_volleyball",
        data_path="synthetic", backbone="res18", image_size=(64, 96),
        out_size=(2, 3), emb_features=512, num_frames=2, num_boxes=12,
        num_features_boxes=32, num_features_gcn=32, lite_dim=None,
        ST_kernel_size=((3, 3),), sampling_ratio=[1], beta_factor=False,
        batch_size=8, compute_dtype="float32", train_backbone=True)
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
    step = make_train_step(model, cfg, tx, frame0_labels=True, has_bn=True,
                           donate=False)
    return cfg, model, state, step, batch


def test_data_parallel_matches_single_device():
    cfg, model, state, step, batch = _setup()
    mesh = make_mesh(cfg)
    assert mesh.shape["data"] == 8

    # single-device baseline (everything on device 0)
    dev0 = jax.devices()[0]
    state0 = jax.device_put(state, dev0)
    batch0 = jax.device_put(batch, dev0)
    new0, m0 = step(state0, batch0)

    # sharded: batch split over 'data', params replicated
    state_r = jax.device_put(state, replicated_sharding(mesh))
    batch_s = jax.device_put(batch, batch_sharding(mesh))
    new_s, m_s = step(state_r, batch_s)

    np.testing.assert_allclose(float(m0["loss"]), float(m_s["loss"]),
                               rtol=1e-4)
    l0 = jax.tree_util.tree_leaves(new0.params)
    ls = jax.tree_util.tree_leaves(new_s.params)
    # reduction-order differences in the cross-device gradient sum are
    # amplified by Adam's rsqrt normalisation for near-zero grads
    for a, b in zip(l0, ls):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-4)


def test_tensor_parallel_2d_mesh_matches_single_device():
    """data=4 x model=2 mesh with TP param layouts (output-feature dims of
    wide kernels sharded over 'model') produces the same update as one
    device — validates that the model axis changes only placement, with
    XLA inserting the collectives."""
    from din_tpu.parallel.mesh import param_sharding

    cfg, model, state, step, batch = _setup()
    cfg2 = cfg.replace(mesh_shape={"data": 4, "model": 2})
    mesh = make_mesh(cfg2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}

    dev0 = jax.devices()[0]
    new0, m0 = step(jax.device_put(state, dev0),
                    jax.device_put(batch, dev0))

    p_shard = param_sharding(mesh, state.params)
    # at least one kernel must actually shard over 'model'
    specs = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda s: str(s.spec), p_shard))
    assert any("model" in sp for sp in specs), specs
    rep = replicated_sharding(mesh)
    state_s = TrainState(
        params=jax.device_put(state.params, p_shard),
        batch_stats=jax.device_put(state.batch_stats, rep),
        opt_state=jax.device_put(
            state.opt_state,
            jax.tree_util.tree_map(lambda _: rep, state.opt_state,
                                   is_leaf=lambda x: hasattr(x, "shape"))),
        rng=jax.device_put(state.rng, rep))
    new_s, m_s = step(state_s, jax.device_put(batch, batch_sharding(mesh)))

    np.testing.assert_allclose(float(m0["loss"]), float(m_s["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(new0.params),
                    jax.tree_util.tree_leaves(new_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-4)


def test_frame_parallel_matches_single_device():
    """Sequence(frame) parallelism: data=2 x model=2 mesh with the flattened
    B*T frame axis sharded over BOTH axes through the trunk
    (cfg.frame_parallel -> Trunk.frame_axes), gathered back to
    batch-over-'data' for the head.  Must equal the single-device update —
    validates the backbone scales over frames, which nn.DataParallel
    (train_net.py:77-78) cannot do below batch == n_gpus."""
    cfg, model, state, step, batch = _setup()
    from din_tpu.train.engine import make_train_step as mts
    tx = make_optimizer(cfg, state.params)

    # chunked single-device baseline: BN-train statistics depend on the
    # frame-chunk micro-batching, so the reference point must use the SAME
    # frame_chunk as the frame-parallel run (placement-only comparison)
    cfg_c = cfg.replace(frame_chunk=8)
    step_c = mts(build_model(cfg_c), cfg_c, tx, frame0_labels=True,
                 has_bn=True, donate=False)
    dev0 = jax.devices()[0]
    new0, m0 = step_c(jax.device_put(state, dev0),
                      jax.device_put(batch, dev0))

    cfg_fp = cfg_c.replace(mesh_shape={"data": 2, "model": 2},
                           frame_parallel=True)
    mesh = make_mesh(cfg_fp)
    model_fp = build_model(cfg_fp)   # trunk carries frame_axes constraints
    step_fp = mts(model_fp, cfg_fp, tx, frame0_labels=True, has_bn=True,
                  donate=False)
    from din_tpu.parallel.mesh import frame_batch_sharding
    with jax.set_mesh(mesh):
        state_r = jax.device_put(state, replicated_sharding(mesh))
        batch_s = jax.device_put(batch, frame_batch_sharding(mesh)(batch))
        new_s, m_s = step_fp(state_r, batch_s)
        jax.block_until_ready(m_s["loss"])

    np.testing.assert_allclose(float(m0["loss"]), float(m_s["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(new0.params),
                    jax.tree_util.tree_leaves(new_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-4)


def test_trunk_warns_on_indivisible_frame_axis():
    """A dropped frame-sharding constraint lets SPMD silently REPLICATE
    the trunk (the zero-speedup dp pathology PERF.md documents);
    models/trunk.py must surface it as a trace-time warning when
    batch*T doesn't divide the mesh extent."""
    from din_tpu.data.synthetic import make_synthetic_batch
    from din_tpu.train.engine import make_train_step

    cfg, model, state, step, batch = _setup()
    cfg3 = cfg.replace(batch_size=3, mesh_shape={"data": 8, "model": 1})
    batch3 = make_synthetic_batch(cfg3, batch_size=3)   # 6 frames % 8 != 0
    tx = make_optimizer(cfg3, state.params)
    step3 = make_train_step(build_model(cfg3), cfg3, tx, frame0_labels=True,
                            has_bn=True, donate=False)
    with jax.set_mesh(make_mesh(cfg3)):
        with pytest.warns(UserWarning, match="does not divide"):
            jax.eval_shape(step3, state, batch3)


def test_mesh_shapes():
    mesh = make_mesh(None)
    assert mesh.shape["data"] * mesh.shape["model"] == len(jax.devices())
    cfg = Config("volleyball").replace(mesh_shape={"data": 4, "model": 2})
    mesh = make_mesh(cfg)
    assert mesh.shape == {"data": 4, "model": 2}


def test_frame_parallel_partitions_trunk_flops():
    """Scaling evidence beyond numerical equivalence: the frame-parallel
    step's per-device compiled program must carry a small fraction of the
    single-device flops — i.e. the backbone genuinely partitions over the
    mesh rather than replicating (XLA cost analysis reports the
    per-partition SPMD module)."""
    from din_tpu.train.engine import make_train_step as mts
    from din_tpu.train.optim import make_optimizer as mko

    def flops_of(compiled):
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(dict(analysis)["flops"])

    cfg, model, state, step, batch = _setup()
    cfg = cfg.replace(frame_chunk=8)
    tx = mko(cfg, state.params)
    step1 = mts(build_model(cfg), cfg, tx, frame0_labels=True, has_bn=True,
                donate=False)
    dev0 = jax.devices()[0]
    f_single = flops_of(step1.lower(jax.device_put(state, dev0),
                                    jax.device_put(batch, dev0)).compile())

    cfg_fp = cfg.replace(mesh_shape={"data": 4, "model": 2},
                         frame_parallel=True)
    mesh = make_mesh(cfg_fp)
    step_fp = mts(build_model(cfg_fp), cfg_fp, tx, frame0_labels=True,
                  has_bn=True, donate=False)
    with jax.set_mesh(mesh):
        state_r = jax.device_put(state, replicated_sharding(mesh))
        batch_s = jax.device_put(batch, batch_sharding(mesh))
        f_fp = flops_of(step_fp.lower(state_r, batch_s).compile())

    # 16 frames over 8 devices: the trunk term should shrink ~8x; allow
    # generous slack for the replicated optimizer/head/collective terms
    assert f_fp < f_single / 3, (f_fp, f_single)


def test_frame_batch_sharding_uneven_frame_axis():
    """T not divisible by the model axis falls back to batch-only sharding
    (device_put rejects uneven dims); divisible T shards both axes."""
    from din_tpu.parallel.mesh import frame_batch_sharding

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "model"))
    shard_for = frame_batch_sharding(mesh)
    batch = {"images": np.zeros((2, 10, 4, 4), np.uint8),   # T=10 % 4 != 0
             "frames8": np.zeros((2, 8, 4), np.float32),    # divisible
             "sample_mask": np.zeros((2,), np.float32)}
    s = shard_for(batch)
    put = jax.device_put(batch, s)                          # must not raise
    assert s["images"].spec == P("data")
    assert s["frames8"].spec == P("data", "model")
    assert s["sample_mask"].spec == P("data")
    assert put["images"].shape == (2, 10, 4, 4)


def test_data_parallel_chunked_trunk_is_sharded_and_matches():
    """Plain dp with the chunked frame scan: the [B*T]->[chunks,chunk]
    packing crosses batch-shard boundaries, and without the trunk's
    frame-sharding constraints the SPMD partitioner REPLICATED the whole
    scan on every device — zero trunk speedup from dp at full resolution
    (found by parallel/scaling.py on the flagship geometry: while-body
    convs at full chunk size per partition).  With the engine's ambient
    mesh (train/engine.py) the per-device program must carry a small
    fraction of the single-device flops AND still match its update."""
    from din_tpu.train.engine import make_train_step as mts

    def flops_of(compiled):
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(dict(analysis)["flops"])

    cfg, model, state, step, batch = _setup()
    cfg_c = cfg.replace(frame_chunk=8)          # 16 frames -> 2 chunks of 8
    tx = make_optimizer(cfg_c, state.params)
    step_c = mts(build_model(cfg_c), cfg_c, tx, frame0_labels=True,
                 has_bn=True, donate=False)
    dev0 = jax.devices()[0]
    state0, batch0 = jax.device_put(state, dev0), jax.device_put(batch, dev0)
    f_single = flops_of(step_c.lower(state0, batch0).compile())
    new0, m0 = step_c(state0, batch0)

    cfg_dp = cfg_c.replace(mesh_shape={"data": 8, "model": 1})
    mesh = make_mesh(cfg_dp)
    step_dp = mts(build_model(cfg_dp), cfg_dp, tx, frame0_labels=True,
                  has_bn=True, donate=False)
    with jax.set_mesh(mesh):
        state_r = jax.device_put(state, replicated_sharding(mesh))
        batch_s = jax.device_put(batch, batch_sharding(mesh))
        f_dp = flops_of(step_dp.lower(state_r, batch_s).compile())
        new_s, m_s = step_dp(state_r, batch_s)
        jax.block_until_ready(m_s["loss"])

    # the trunk term (dominant) must shrink ~8x; replicated would be ~1x
    assert f_dp < f_single / 3, (f_dp, f_single)
    np.testing.assert_allclose(float(m0["loss"]), float(m_s["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(new0.params),
                    jax.tree_util.tree_leaves(new_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-4)


def test_shard_local_chunk_packing_matches_and_removes_repacking():
    """Shard-local chunk packing (models/trunk.py _pack_shard_local): with a
    BN-free trunk (vgg16) the permuted dp program must (a) match the
    single-device update and (b) contain far less non-all-reduce collective
    traffic than the order-preserving packing, whose [B*T]->[chunks,chunk]
    reshape crosses batch-shard boundaries and forces the SPMD partitioner
    to move the frame tensor over ICI every step."""
    from din_tpu.parallel.scaling import parse_collectives
    from din_tpu.train.engine import make_train_step as mts

    cfg = Config("volleyball").replace(
        training_stage=2, inference_module_name="dynamic_volleyball",
        data_path="synthetic", backbone="vgg16", image_size=(64, 96),
        out_size=(2, 3), emb_features=512, num_frames=2, num_boxes=12,
        num_features_boxes=32, num_features_gcn=32, lite_dim=None,
        ST_kernel_size=((3, 3),), sampling_ratio=[1], beta_factor=False,
        batch_size=8, compute_dtype="float32", train_backbone=True,
        frame_chunk=8)                       # 16 frames -> 2 chunks of 8
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
    has_bn = bool(variables.get("batch_stats"))

    dev0 = jax.devices()[0]
    step1 = mts(model, cfg, tx, frame0_labels=True, has_bn=has_bn,
                donate=False)
    new0, m0 = step1(jax.device_put(state, dev0), jax.device_put(batch, dev0))

    def repack_bytes(compiled):
        return sum(c["bytes"] for c in parse_collectives(compiled.as_text())
                   if c["op"] != "all-reduce")

    mesh = make_mesh(cfg.replace(mesh_shape={"data": 8, "model": 1}))
    results = {}
    with jax.set_mesh(mesh):
        state_r = jax.device_put(state, replicated_sharding(mesh))
        batch_s = jax.device_put(batch, batch_sharding(mesh))
        for mode in ("off", "auto"):
            cfg_m = cfg.replace(mesh_shape={"data": 8, "model": 1},
                                shard_local_chunks=mode)
            step_m = mts(build_model(cfg_m), cfg_m, tx, frame0_labels=True,
                         has_bn=has_bn, donate=False)
            compiled = step_m.lower(state_r, batch_s).compile()
            results[mode] = (repack_bytes(compiled), step_m)

    assert results["off"][0] > 0            # old packing does move frames
    # permuted packing: only the small head/eval gathers may remain
    assert results["auto"][0] < results["off"][0] / 4, \
        (results["auto"][0], results["off"][0])

    with jax.set_mesh(mesh):
        new_s, m_s = results["auto"][1](state_r, batch_s)
        jax.block_until_ready(m_s["loss"])
    np.testing.assert_allclose(float(m0["loss"]), float(m_s["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(new0.params),
                    jax.tree_util.tree_leaves(new_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-4)


def test_zero1_opt_state_sharding_matches_replicated():
    """cfg.shard_opt_state (ZeRO-1): Adam moments sharded over 'data' must
    (a) produce the same two-step trajectory as replicated opt state,
    (b) actually shard the moment arrays (per-chip shard < full leaf), and
    (c) STAY sharded across steps (the with_sharding_constraint in
    make_train_step — without it the partitioner may re-replicate)."""
    from din_tpu.parallel.mesh import opt_state_sharding
    from din_tpu.train.optim import set_learning_rate

    cfg, model, state, step, batch = _setup()
    mesh = make_mesh(cfg)
    rep = replicated_sharding(mesh)
    batch_s = jax.device_put(batch, batch_sharding(mesh))

    # baseline: replicated opt state, two steps
    new_r = jax.device_put(state, rep)
    with jax.set_mesh(mesh):
        new_r, m_r1 = step(new_r, batch_s)
        new_r, m_r2 = step(new_r, batch_s)

    # ZeRO-1: moments sharded over 'data', output constrained to stay so
    opt_sh = opt_state_sharding(mesh, state.opt_state)
    specs = [str(s.spec) for s in jax.tree_util.tree_leaves(opt_sh)]
    assert any("data" in sp for sp in specs), specs
    tx = make_optimizer(cfg, state.params)
    step_z = make_train_step(model, cfg, tx, frame0_labels=True, has_bn=True,
                             donate=False, opt_sharding=opt_sh)
    state_z = TrainState(params=jax.device_put(state.params, rep),
                         batch_stats=jax.device_put(state.batch_stats, rep),
                         opt_state=jax.device_put(state.opt_state, opt_sh),
                         rng=jax.device_put(state.rng, rep))
    with jax.set_mesh(mesh):
        state_z, m_z1 = step_z(state_z, batch_s)
        # epoch-boundary lr rewrite must not disturb the moment layout
        state_z = state_z.replace(
            opt_state=set_learning_rate(state_z.opt_state,
                                        cfg.train_learning_rate))
        state_z, m_z2 = step_z(state_z, batch_s)

    np.testing.assert_allclose(float(m_r1["loss"]), float(m_z1["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m_r2["loss"]), float(m_z2["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(new_r.params),
                    jax.tree_util.tree_leaves(state_z.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-4)

    # moments are sharded AFTER two steps: some leaf's addressable shard
    # holds 1/8 of the elements
    sharded = [l for l in jax.tree_util.tree_leaves(state_z.opt_state)
               if hasattr(l, "sharding") and l.ndim
               and not l.sharding.is_fully_replicated]
    assert sharded, "no opt-state leaf stayed sharded after two steps"
    leaf = max(sharded, key=lambda l: l.size)
    shard_elems = np.prod(leaf.addressable_shards[0].data.shape)
    assert shard_elems * mesh.shape["data"] == leaf.size, \
        (leaf.shape, leaf.addressable_shards[0].data.shape)


def test_opt_state_sharding_align_model_mirrors_param_layout():
    """opt_state_sharding(align_model=True) (ADVICE r4 #2): on a
    tensor-parallel mesh the Adam-moment layout must mirror param_sharding
    — last dim of every 2-D+ divisible leaf on 'model' (so model-sharded
    grads update moments without resharding), ZeRO 'data' sharding only on
    some OTHER dim, scalars replicated."""
    from din_tpu.parallel.mesh import opt_state_sharding, param_sharding

    cfg = Config("volleyball").replace(mesh_shape={"data": 4, "model": 2})
    mesh = make_mesh(cfg)
    fake_moments = {
        "kernel": np.zeros((3, 3, 64, 128), np.float32),    # both axes
        "dense": np.zeros((256, 512), np.float32),
        "bias": np.zeros((128,), np.float32),               # data only
        "odd": np.zeros((7, 9), np.float32),                # neither
        "count": np.zeros((), np.int32),
    }
    opt_sh = opt_state_sharding(mesh, fake_moments, align_model=True)
    p_sh = param_sharding(mesh, fake_moments)
    for name in ("kernel", "dense"):
        assert opt_sh[name].spec[-1] == "model", (name, opt_sh[name].spec)
        # mirrors param_sharding on the model axis
        assert p_sh[name].spec[-1] == "model"
        assert "data" in [a for a in opt_sh[name].spec[:-1] if a], \
            (name, opt_sh[name].spec)
    assert "model" not in tuple(opt_sh["bias"].spec) and \
        "data" in tuple(opt_sh["bias"].spec), opt_sh["bias"].spec
    assert opt_sh["odd"].is_fully_replicated, opt_sh["odd"].spec
    assert opt_sh["count"].is_fully_replicated

    # default (engine path, replicated params) is unchanged: no 'model' axis
    opt_dp = opt_state_sharding(mesh, fake_moments)
    assert all("model" not in tuple(s.spec)
               for s in jax.tree_util.tree_leaves(opt_dp))
