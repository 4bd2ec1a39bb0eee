"""Two-stage training engine.

Replaces the reference's twin drivers (train_net.py:28-137,
train_net_dynamic.py:27-157) with a single engine: one *compiled program per
training step* (backbone + RoIAlign + head + loss + Adam update), a unified
dict output protocol for every model, per-epoch evaluation with confusion /
MPCA, epoch-keyed lr plan, best tracking and checkpointing.

Data parallelism: with multiple devices the batch is sharded over the
``data`` mesh axis and parameters are replicated; XLA inserts the gradient
all-reduce (SURVEY.md §2.7 — the TPU answer to nn.DataParallel,
train_net.py:77-78).
"""

from __future__ import annotations

import contextlib
import os
from typing import Any, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from din_tpu.data.datasets import return_dataset
from din_tpu.data.loader import BatchLoader, prefetch_to_device
from din_tpu.models.registry import build_model
from din_tpu.parallel.mesh import (batch_sharding, frame_batch_sharding,
                                   make_mesh, replicated_sharding)
from din_tpu.train import checkpoint as ckpt_lib
from din_tpu.train.losses import compute_losses
from din_tpu.train.preempt import PreemptionGuard
from din_tpu.train.optim import lr_for_epoch, make_optimizer, set_learning_rate
from din_tpu.utils.logging import print_log, show_config, show_epoch_info
from din_tpu.utils.meters import MPCA, Timer
from din_tpu.utils.profiling import profiler_trace


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: Any


def init_model(cfg, model, sample_batch):
    rngs = {"params": jax.random.PRNGKey(cfg.train_random_seed),
            "dropout": jax.random.PRNGKey(cfg.train_random_seed + 1)}
    # jit the whole init: eager model.init dispatches every op separately,
    # which over a remote-device transport (this environment's tunnel) costs
    # a round-trip per op — ~2 min for the flagship model vs one compiled
    # (and persistently cached) program here
    init_fn = jax.jit(model.init, static_argnames=("train",))
    variables = init_fn(
        rngs, jnp.asarray(sample_batch["images"]),
        jnp.asarray(sample_batch["boxes"]),
        bboxes_num=(jnp.asarray(sample_batch["bboxes_num"])
                    if "bboxes_num" in sample_batch else None),
        train=False)
    return variables


def _combine_micro_metrics(stacked: Dict) -> Dict:
    """Reduce scan-stacked per-micro-batch metrics to batch metrics:
    counters/confusions sum, losses average (micro-batches are equal-sized,
    so the mean of per-micro means equals the full-batch mean)."""
    return {k: (v.sum(0) if k.endswith(("_correct", "_total", "_conf"))
                else v.mean(0))
            for k, v in stacked.items()}


def make_train_step(model, cfg, tx, frame0_labels: bool, has_bn: bool,
                    donate: bool = True, opt_sharding=None):
    """opt_sharding: optional pytree of NamedShardings matching opt_state
    (parallel/mesh.py opt_state_sharding).  Constraining the UPDATED
    opt_state keeps the Adam moments sharded across steps — without it the
    partitioner is free to re-replicate them and the ZeRO-1 memory saving
    silently evaporates after step 1."""
    accum = max(int(getattr(cfg, "grad_accum_steps", 1) or 1), 1)
    if accum > 1:
        return _make_accum_train_step(model, cfg, tx, frame0_labels, has_bn,
                                      donate, accum, opt_sharding)

    def step(state: TrainState, batch: Dict):
        rng, new_rng = jax.random.split(state.rng)

        def loss_fn(params):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
            kwargs = dict(train=True, rngs={"dropout": rng})
            bn = batch.get("bboxes_num")
            if has_bn:
                out, new_vars = model.apply(
                    variables, batch["images"], batch["boxes"],
                    bboxes_num=bn, mutable=["batch_stats"], **kwargs)
                new_stats = new_vars["batch_stats"]
            else:
                out = model.apply(variables, batch["images"], batch["boxes"],
                                  bboxes_num=bn, **kwargs)
                new_stats = state.batch_stats
            metrics = compute_losses(out, batch, cfg, frame0_labels)
            return metrics["loss"], (metrics, new_stats)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_stats)), grads = grad_fn(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if opt_sharding is not None:
            opt_state = jax.lax.with_sharding_constraint(
                opt_state, opt_sharding)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, batch_stats=new_stats,
                               opt_state=opt_state, rng=new_rng)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _make_accum_train_step(model, cfg, tx, frame0_labels: bool, has_bn: bool,
                           donate: bool, accum: int, opt_sharding=None):
    """cfg.grad_accum_steps > 1: lax.scan over equal micro-batches, ONE
    optimizer update on the averaged grads.  Exact large-batch gradient
    semantics at micro-batch memory (up to masked-loss sample weighting:
    micro-batches are mean-combined, so when micro-batches contain
    different VALID counts — collective padding, pad_last eval — samples
    in emptier micro-batches weigh slightly more; volleyball training
    batches are always fully valid).  BN batch_stats are carried
    micro-batch to micro-batch, the same DataParallel-analogue semantics
    as the frame-chunk scan (models/trunk.py)."""

    def step(state: TrainState, batch: Dict):
        rng, new_rng = jax.random.split(state.rng)
        mb_rngs = jax.random.split(rng, accum)

        def split(x):
            assert x.shape[0] % accum == 0, (
                f"batch axis {x.shape[0]} not divisible by "
                f"grad_accum_steps={accum}")
            return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

        micro = jax.tree_util.tree_map(split, batch)

        def loss_fn(params, stats, mb, mb_rng):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = stats
            kwargs = dict(train=True, rngs={"dropout": mb_rng})
            bn = mb.get("bboxes_num")
            if has_bn:
                out, new_vars = model.apply(
                    variables, mb["images"], mb["boxes"],
                    bboxes_num=bn, mutable=["batch_stats"], **kwargs)
                new_stats = new_vars["batch_stats"]
            else:
                out = model.apply(variables, mb["images"], mb["boxes"],
                                  bboxes_num=bn, **kwargs)
                new_stats = stats
            metrics = compute_losses(out, mb, cfg, frame0_labels)
            return metrics["loss"], (metrics, new_stats)

        grad_fn = jax.grad(loss_fn, has_aux=True)

        def body(carry, xs):
            stats, gacc = carry
            mb, mb_rng = xs
            grads, (metrics, new_stats) = grad_fn(
                state.params, stats, mb, mb_rng)
            gacc = jax.tree_util.tree_map(jnp.add, gacc, grads)
            return (new_stats, gacc), metrics

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (new_stats, gsum), stacked = jax.lax.scan(
            body, (state.batch_stats, zero_grads), (micro, mb_rngs))
        grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
        metrics = _combine_micro_metrics(stacked)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if opt_sharding is not None:
            opt_state = jax.lax.with_sharding_constraint(
                opt_state, opt_sharding)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, batch_stats=new_stats,
                               opt_state=opt_state, rng=new_rng)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, cfg, frame0_labels: bool):
    def step(params, batch_stats, batch: Dict):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, batch["images"], batch["boxes"],
                          bboxes_num=batch.get("bboxes_num"), train=False)
        return compute_losses(out, batch, cfg, frame0_labels)

    return jax.jit(step)


def make_mad_step(model, cfg):
    """Per-batch DIN MAD node tensor [B, T*N, 1+k2, C] (centre feature +
    sampled neighbourhood — the reference's 'dynamic' field analysis,
    utils.py:302-384)."""

    def step(params, batch_stats, batch: Dict):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, batch["images"], batch["boxes"],
                          bboxes_num=batch.get("bboxes_num"), train=False,
                          return_mad=True)
        sampled = out["mad_features"]                 # [B,T,N,k2,C]
        center = out["mad_center"][:, :, :, None]     # [B,T,N,1,C]
        nodes = jnp.concatenate([center, sampled], axis=3)
        B, T, N, K, C = nodes.shape
        return nodes.reshape(B, T * N, K, C)

    return jax.jit(step)


def _epoch_info(metric_list, epoch, elapsed, num_activities, clips=None):
    conf = np.zeros((num_activities, num_activities), np.int64)
    loss_sum, n = 0.0, 0
    act_c = act_t = actn_c = actn_t = 0
    for m in metric_list:
        m = jax.tree_util.tree_map(np.asarray, m)
        conf += m["activities_conf"].astype(np.int64)
        loss_sum += float(m["loss"])
        n += 1
        act_c += int(m["activities_correct"])
        act_t += int(m["activities_total"])
        if "actions_correct" in m:
            actn_c += int(m["actions_correct"])
            actn_t += int(m["actions_total"])
    info = {
        "epoch": epoch,
        "time": elapsed,
        "loss": loss_sum / max(n, 1),
        "activities_acc": 100.0 * act_c / max(act_t, 1),
        "activities_conf": conf,
        "activities_MPCA": MPCA(np.maximum(conf, 0) + (conf.sum() == 0)),
    }
    if actn_t:
        info["actions_acc"] = 100.0 * actn_c / max(actn_t, 1)
    if clips and elapsed > 0:
        info["clips_per_sec"] = clips / elapsed
    return info


def newest_resumable(result_path: str, training_stage: int):
    """Newest resumable checkpoint in result_path, or None.  Stage 2 saves
    full state every eval; stage 1's regular saves are component-style
    (not resumable), so only its _preempt full-state emergency saves
    (train/preempt.py) qualify.  Tie-break: a _preempt save carries the
    same epoch number as that epoch's regular eval save but is strictly
    newer work (mid-NEXT-epoch state) — prefer it at equal epoch."""
    ckpts = [f for f in os.listdir(result_path) if f.endswith(".ckpt")]
    if training_stage == 1:
        ckpts = [f for f in ckpts if "_preempt" in f]
    ckpts = sorted(ckpts,
                   key=lambda f: (int(f.split("epoch")[1].split("_")[0]),
                                  "_preempt" in f))
    return os.path.join(result_path, ckpts[-1]) if ckpts else None


def train_net(cfg, max_steps_per_epoch: Optional[int] = None):
    """Full training driver (reference train_net.py:28-137).  Returns the
    best eval info dict.

    Multi-device runs execute under an ambient mesh (SCOPED here — a bare
    ``jax.set_mesh`` would leak the mesh process-globally and taint every
    later jit in the process, e.g. a caller's single-device work): the
    trunk's frame-sharding constraints resolve against it.  Required for
    frame_parallel, and for plain dp it keeps the chunked frame scan
    SHARDED — without it SPMD replicates the whole trunk scan on every
    device (parallel/mesh.py frame_axes).  Single-device runs skip it so
    their compiled programs (and caches) are unchanged."""
    mesh = make_mesh(cfg)
    if mesh.size > 1:
        with jax.set_mesh(mesh):
            return _train_net(cfg, max_steps_per_epoch, mesh)
    return _train_net(cfg, max_steps_per_epoch, mesh)


def _train_net(cfg, max_steps_per_epoch: Optional[int], mesh):
    cfg.init_config()
    show_config(cfg)
    if cfg.debug_nans:
        # crash-fast NaN detection (the closest TPU analogue of a
        # sanitizer run — SURVEY.md §5 'race detection / sanitizers')
        jax.config.update("jax_debug_nans", True)

    # elastic recovery: pick up the newest checkpoint in result_path
    # (crash = lost run in the reference; SURVEY.md §5 failure detection).
    # Stage 2 saves full state every eval; stage 1's regular saves are
    # component-style (not resumable), so only its _preempt full-state
    # emergency saves (train/preempt.py) qualify.
    if cfg.auto_resume and not cfg.stage2model:
        newest = newest_resumable(cfg.result_path, cfg.training_stage)
        if newest:
            cfg.stage2model = newest
            cfg.load_stage2model = True
            cfg.load_backbone_stage2 = False

    training_set, validation_set = return_dataset(cfg)
    # per-host data sharding: disjoint strided shards of the shared
    # permutation (parallel/multihost.py; single-process = whole dataset)
    pi, pc = jax.process_index(), jax.process_count()
    train_loader = BatchLoader(training_set, cfg.batch_size, shuffle=True,
                               num_workers=cfg.num_workers,
                               seed=cfg.train_random_seed,
                               process_index=pi, process_count=pc)
    # remainder eval batches are padded (cycled) + masked so every eval
    # step shares one compiled program (losses honour sample_mask)
    val_loader = BatchLoader(validation_set, cfg.test_batch_size,
                             shuffle=False, num_workers=cfg.num_workers,
                             drop_last=False, pad_last=True,
                             process_index=pi, process_count=pc)

    _data_sharding = batch_sharding(mesh)
    if getattr(cfg, "frame_parallel", False):
        # batch over 'data' AND the frame (T) axis over 'model', so the
        # trunk's (B*T)-frame resharding is local instead of SPMD's
        # replicate-then-repartition fallback (parallel/mesh.py)
        _data_sharding = frame_batch_sharding(mesh)
    rep_sharding = replicated_sharding(mesh)
    n_data = mesh.shape["data"]

    warned_replicated = []

    def data_sharding(batch):
        # remainder eval batches that don't divide the data axis replicate
        if batch["images"].shape[0] % n_data == 0:
            return _data_sharding(batch) if callable(_data_sharding) \
                else _data_sharding
        if not warned_replicated:
            # with pad_last this only triggers on mis-set batch sizes; make
            # the silent compute degradation visible (VERDICT r2 weak #5)
            print_log(cfg.log_path,
                      "WARNING: batch of %d does not divide the data axis "
                      "(%d); replicating the batch on every device — set "
                      "batch sizes to a multiple of the data axis."
                      % (batch["images"].shape[0], n_data))
            warned_replicated.append(True)
        return rep_sharding

    model = build_model(cfg)
    sample = next(iter(BatchLoader(training_set, cfg.batch_size,
                                   shuffle=False, num_workers=1)))
    variables = init_model(cfg, model, sample)

    # weight loading (train_net_dynamic.py:75-93)
    start_epoch, resumed_opt = 1, None
    resume_step, resume_rng = 0, None    # mid-epoch preemption resume
    if getattr(cfg, "ref_checkpoint_path", ""):
        # migration path: graft a checkpoint saved by the reference
        # framework (either .pth format — nn/ref_import.py)
        from din_tpu.nn.ref_import import load_reference_checkpoint
        variables, skipped = load_reference_checkpoint(
            variables, cfg.ref_checkpoint_path, cfg, verbose=False)
        print_log(cfg.log_path,
                  "Loaded reference checkpoint %s (%d keys skipped)"
                  % (cfg.ref_checkpoint_path, len(skipped)))
    if cfg.training_stage == 2:
        if cfg.load_backbone_stage2 and cfg.stage1_model_path:
            variables = ckpt_lib.load_backbone_stage2(
                variables, cfg.stage1_model_path)
            print_log(cfg.log_path,
                      "Loaded stage1 backbone: " + cfg.stage1_model_path)
        elif cfg.load_stage2model and cfg.stage2model:
            (variables, last_epoch, resumed_opt,
             extras) = ckpt_lib.load_stage2_model(variables, cfg.stage2model)
            start_epoch = last_epoch + 1
            resume_step, resume_rng = extras["step"], extras["rng"]
            print_log(cfg.log_path,
                      "Loading stage2 model: %s (resuming at epoch %d%s)"
                      % (cfg.stage2model, start_epoch,
                         ", step %d" % resume_step if resume_step else ""))
        else:
            print_log(cfg.log_path, "Not loading stage1 or stage2 model.")
    elif cfg.load_stage2model and cfg.stage2model:
        # stage-1 preemption resume: the _preempt emergency save is the
        # same full-state payload load_stage2_model restores by template
        (variables, last_epoch, resumed_opt,
         extras) = ckpt_lib.load_stage2_model(variables, cfg.stage2model)
        start_epoch = last_epoch + 1
        resume_step, resume_rng = extras["step"], extras["rng"]
        print_log(cfg.log_path,
                  "Resuming stage1 from %s (epoch %d%s)"
                  % (cfg.stage2model, start_epoch,
                     ", step %d" % resume_step if resume_step else ""))
    elif cfg.pretrained_backbone_path:
        from din_tpu.nn.torch_port import (convert_backbone_state,
                                           torch_file_to_numpy)
        state = torch_file_to_numpy(cfg.pretrained_backbone_path)
        conv = convert_backbone_state(state, cfg.backbone)
        bb_path = lambda tree: {"trunk": {"frames_scan": {"backbone": tree}}}
        variables = ckpt_lib.graft_variables(
            variables,
            {"params": bb_path(conv["params"]),
             **({"batch_stats": bb_path(conv["batch_stats"])}
                if "batch_stats" in conv else {})})
        print_log(cfg.log_path, "Loaded pretrained backbone: "
                  + cfg.pretrained_backbone_path)

    tx = make_optimizer(cfg, variables["params"])
    # jit: eager optax init is two dispatches per param leaf — expensive
    # over a remote-device transport (see init_model)
    opt_state = jax.jit(tx.init)(variables["params"])
    if getattr(cfg, "ref_checkpoint_path", "") and \
            getattr(cfg, "ref_resume_optimizer", False):
        # exact mid-training migration: adopt the torch Adam moments the
        # reference saved (but never restored) and continue at epoch + 1
        from din_tpu.nn.ref_import import load_reference_optimizer
        opt_state, ref_epoch = load_reference_optimizer(
            opt_state, cfg.ref_checkpoint_path, cfg)
        start_epoch = ref_epoch + 1
        print_log(cfg.log_path,
                  "Adopted reference optimizer state (resuming at epoch "
                  f"{start_epoch})")
    if resumed_opt is not None:
        # full resume incl. Adam moments (the reference saves but never
        # restores optimizer state, train_net.py:99,121-125 — fixed here)
        opt_state = flax.serialization.from_state_dict(opt_state, resumed_opt)
    rng = jax.random.PRNGKey(cfg.train_random_seed + 7) \
        if resume_rng is None else jnp.asarray(resume_rng)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=opt_state, rng=rng)
    state = jax.device_put(state, rep_sharding)

    opt_shardings = None
    if getattr(cfg, "shard_opt_state", False) and mesh.shape["data"] > 1:
        # ZeRO-1: Adam moments sharded over 'data' (exact semantics —
        # parallel/mesh.py opt_state_sharding); per-chip optimizer memory
        # 2x params -> 2x/n_data
        from din_tpu.parallel.mesh import opt_state_sharding
        opt_shardings = opt_state_sharding(mesh, state.opt_state)
        state = state.replace(
            opt_state=jax.device_put(state.opt_state, opt_shardings))
        print_log(cfg.log_path,
                  "ZeRO-1: optimizer state sharded over data axis (%d)"
                  % mesh.shape["data"])

    has_bn = bool(variables.get("batch_stats"))
    frame0 = cfg.training_stage == 2
    train_step = make_train_step(model, cfg, tx, frame0, has_bn,
                                 donate=cfg.donate_step_buffers,
                                 opt_sharding=opt_shardings)
    eval_step = make_eval_step(model, cfg, frame0)

    mad_step = None
    if cfg.measure_mad and cfg.inference_module_name.startswith("dynamic") \
            and cfg.training_stage == 2:
        mad_step = make_mad_step(model, cfg)

    def run_eval(state, epoch, stop=None):
        from din_tpu.utils.meters import MADmeter
        timer = Timer()
        metrics = []
        preempted = False
        mad_meter = MADmeter(cfg.num_frames, cfg.num_boxes) \
            if mad_step is not None else None
        for batch in prefetch_to_device(iter(val_loader),
                                        size=cfg.prefetch_depth,
                                        sharding=data_sharding):
            metrics.append(eval_step(state.params, state.batch_stats, batch))
            if stop is not None and stop():
                # preemption mid-eval: abort so the emergency save happens
                # within the grace window, not after a full eval pass
                preempted = True
                break
            if mad_meter is not None:
                nodes = np.asarray(
                    mad_step(state.params, state.batch_stats, batch))
                if "sample_mask" in batch:   # drop padded rows
                    nodes = nodes[np.asarray(batch["sample_mask"]) > 0]
                mad_meter.cal_MAD(nodes, field=None, field_shape="dynamic")
        info = _epoch_info(metrics, epoch, timer.timeit(),
                           cfg.num_activities)
        if mad_meter is not None:
            info["MAD"] = float(mad_meter.output_MAD())
        if preempted:
            info["preempted"] = True
        return info

    best = {"epoch": 0, "activities_acc": 0.0}
    total_timer = Timer()

    def save_preempt(state, last_done_epoch, steps_done):
        """Full-state emergency save; filename matches the auto_resume
        epoch-number grammar, and the payload carries the completed step
        count + step PRNG so the resumed run continues the interrupted
        epoch EXACTLY where it stopped (train/preempt.py; loader
        set_epoch makes the data order resume-invariant)."""
        path = os.path.join(
            cfg.result_path, "stage%d_epoch%d_preempt.ckpt"
            % (cfg.training_stage, last_done_epoch))
        ckpt_lib.save_checkpoint(path, {
            "epoch": last_done_epoch,
            "step": steps_done,
            "rng": np.asarray(state.rng),
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": flax.serialization.to_state_dict(state.opt_state),
        }, backend=getattr(cfg, "checkpoint_backend", "msgpack"))
        print_log(cfg.log_path,
                  "preemption: state saved to %s (epoch %d, %d steps done) "
                  "— resume with auto_resume=True"
                  % (path, last_done_epoch + 1, steps_done))

    guard_ctx = PreemptionGuard() if getattr(
        cfg, "graceful_preemption", True) else contextlib.nullcontext()
    with guard_ctx as guard:
        def stop():
            # the stop decision must be GLOBAL on multi-host jobs: a host
            # that stopped while another entered the next step's gradient
            # all-reduce deadlocks it — agree by all-gathering the local
            # flag (every host calls this at every boundary)
            local = guard is not None and guard.should_stop
            if pc > 1:
                from jax.experimental import multihost_utils
                return bool(multihost_utils.process_allgather(
                    np.int32(local)).max())
            return bool(local)

        if getattr(cfg, "eval_only", False):
            # one eval pass on the loaded weights, no training (first-class
            # form of the reference's test_before_train + max_epoch=0 hack)
            info = run_eval(state, start_epoch - 1, stop)
            if info.pop("preempted", False):
                # partial metrics from an aborted eval pass must not be
                # reported as the checkpoint's score
                print_log(cfg.log_path,
                          "eval_only pass preempted mid-eval; partial "
                          "metrics discarded — rerun to score")
                return {"preempted": True}
            show_epoch_info("Test", cfg.log_path, info)
            return info

        if cfg.test_before_train:
            info = run_eval(state, 0, stop)
            if info.pop("preempted", False):
                save_preempt(state, start_epoch - 1, resume_step)
                return best
            show_epoch_info("Test", cfg.log_path, info)
        return _epoch_loop(cfg, state, stop, best, total_timer, start_epoch,
                           train_loader, train_step, data_sharding, run_eval,
                           save_preempt, max_steps_per_epoch, resume_step)


def _epoch_loop(cfg, state, stop, best, total_timer, start_epoch,
                train_loader, train_step, data_sharding, run_eval,
                save_preempt, max_steps_per_epoch, resume_step=0):
    last_epoch = getattr(cfg, "train_to_epoch", None) or \
        (start_epoch + cfg.max_epoch - 1)
    for epoch in range(start_epoch, last_epoch + 1):
        if epoch in cfg.lr_plan:
            print_log(cfg.log_path,
                      "change learning rate: %g" % cfg.lr_plan[epoch])
        state = state.replace(opt_state=set_learning_rate(
            state.opt_state, lr_for_epoch(cfg, epoch)))
        # resume-invariant data order: shuffle is a pure function of
        # (seed, epoch); the first epoch after a mid-epoch preemption skips
        # its already-consumed batches
        skipped = resume_step if epoch == start_epoch else 0
        train_loader.set_epoch(epoch, skip_batches=skipped)

        timer = Timer()
        metrics = []
        trace_ctx = profiler_trace(cfg.profile_dir) \
            if (cfg.profile_dir and epoch == start_epoch) \
            else contextlib.nullcontext()
        with trace_ctx:
            for i, batch in enumerate(prefetch_to_device(
                    iter(train_loader), size=cfg.prefetch_depth,
                    sharding=data_sharding)):
                state, m = train_step(state, batch)
                metrics.append(m)
                if stop():
                    # preemption: save at the step boundary (never inside
                    # the compiled step) and exit cleanly; resume continues
                    # this epoch at the next batch
                    save_preempt(state, epoch - 1, skipped + i + 1)
                    return best
                if max_steps_per_epoch and i + 1 >= max_steps_per_epoch:
                    break
        info = _epoch_info(metrics, epoch, timer.timeit(),
                           cfg.num_activities,
                           clips=len(metrics) * cfg.batch_size)
        show_epoch_info("Train", cfg.log_path, info)

        if epoch % cfg.test_interval_epoch == 0:
            test_info = run_eval(state, epoch, stop)
            if test_info.pop("preempted", False):
                # epoch finished training; save it complete (step 0) and
                # skip best-tracking on the partial eval
                save_preempt(state, epoch, 0)
                return best
            show_epoch_info("Test", cfg.log_path, test_info)
            if test_info["activities_acc"] > best["activities_acc"]:
                best = test_info
            print_log(cfg.log_path,
                      "Best group activity accuracy: %.2f%% at epoch #%d."
                      % (best["activities_acc"], best["epoch"]))

            filepath = os.path.join(
                cfg.result_path, "stage%d_epoch%d_%.2f%%.ckpt"
                % (cfg.training_stage, epoch, test_info["activities_acc"]))
            backend = getattr(cfg, "checkpoint_backend", "msgpack")
            if cfg.training_stage == 2:
                # leaves stay jax.Arrays: the orbax backend writes sharded
                # leaves distributed; the msgpack backend moves them to host
                ckpt_lib.save_checkpoint(filepath, {
                    "epoch": epoch,
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": flax.serialization.to_state_dict(
                        state.opt_state),
                }, backend=backend)
                print_log(cfg.log_path, "model saved to: " + filepath)
                if getattr(cfg, "keep_checkpoints", 0):
                    removed = ckpt_lib.prune_checkpoints(
                        cfg.result_path, cfg.training_stage,
                        cfg.keep_checkpoints)
                    if removed:
                        print_log(cfg.log_path,
                                  "pruned %d old checkpoints" % len(removed))
            elif test_info["activities_acc"] == best["activities_acc"]:
                ckpt_lib.save_stage1_components(
                    filepath, {"params": state.params,
                               "batch_stats": state.batch_stats},
                    backend=backend)
                print_log(cfg.log_path, "model saved to: " + filepath)

    # final summary + experiment db (utils.py:131-158)
    from din_tpu.utils.logging import log_final_exp_result
    log_final_exp_result(
        cfg.log_path, os.path.join(cfg.result_root, "experiments.json"),
        {"cfg": cfg, "best_result": best,
         "total_time": total_timer.timeit() / 3600.0})
    return best
