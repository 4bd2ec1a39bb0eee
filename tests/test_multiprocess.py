"""TRUE multi-process (multi-host) data parallelism.

The reference's parallelism is single-process nn.DataParallel
(train_net.py:77-78).  din_tpu claims the TPU-pod equivalent — per-host
processes joined by jax.distributed with the mesh spanning all hosts'
chips (parallel/multihost.py).  The virtual-mesh tests in
test_parallel.py validate the SPMD math but run ONE process; this test
actually spawns separate OS processes (2 hosts x 2 virtual CPU devices,
gloo collectives) and asserts the jointly-computed train step equals the
same step in a single 4-device process: cross-process collectives,
global-array construction from per-host data, and multihost init all
work end-to-end.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_THIS = os.path.abspath(__file__)
_REPO = os.path.dirname(os.path.dirname(_THIS))


def _worker(coordinator, n_proc, pid):
    """Runs in a fresh process: join the cluster, build the GLOBAL batch
    deterministically, run one sharded train step over all global devices,
    print replicated scalars."""
    import jax

    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from din_tpu.parallel.multihost import initialize_multihost

    info = initialize_multihost(coordinator, n_proc, pid)
    assert info["process_count"] == n_proc, info

    import numpy as np
    import jax.numpy as jnp

    from din_tpu.config import Config
    from din_tpu.data.synthetic import SyntheticDataset
    from din_tpu.models.registry import build_model
    from din_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                       replicated_sharding)
    from din_tpu.train.engine import TrainState, init_model, make_train_step
    from din_tpu.train.optim import make_optimizer

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
    # deterministic PRNG -> every process initialises identical weights
    # locally (what a real pod does; no weight broadcast needed)
    variables = init_model(cfg, model, batch)
    tx = make_optimizer(cfg, variables["params"])
    opt_state = tx.init(variables["params"])

    mesh = make_mesh(cfg)           # spans ALL global devices
    rep = replicated_sharding(mesh)
    data_sh = batch_sharding(mesh)

    def globalize(tree, sharding):
        """Host numpy -> global jax.Array; each process materialises only
        its addressable shards."""
        def leaf(v):
            v = np.asarray(v)
            return jax.make_array_from_callback(
                v.shape, sharding, lambda idx: v[idx])
        return jax.tree_util.tree_map(leaf, tree)

    state = TrainState(params=globalize(variables["params"], rep),
                       batch_stats=globalize(
                           variables.get("batch_stats", {}), rep),
                       opt_state=globalize(opt_state, rep),
                       rng=globalize(jax.random.PRNGKey(3), rep))
    step = make_train_step(model, cfg, tx, frame0_labels=True, has_bn=True,
                           donate=False)
    with jax.set_mesh(mesh):
        new_state, metrics = step(state, globalize(batch, data_sh))
        loss = float(metrics["loss"])       # replicated -> readable
        checksum = sum(float(jnp.mean(jnp.abs(l)))
                       for l in jax.tree_util.tree_leaves(new_state.params))

        # cfg.shard_opt_state save path (ADVICE r4): ZeRO-sharded Adam
        # moments are NOT fully addressable on a 2-process mesh — the
        # msgpack backend must gather them (checkpoint._to_host) with every
        # process participating; every process writes identical bytes.
        opt_ckpt = os.environ.get("DIN_TEST_OPT_CKPT", "")
        opt_save_ok = None
        if opt_ckpt:
            import flax

            from din_tpu.parallel.mesh import opt_state_sharding
            from din_tpu.train.checkpoint import (load_checkpoint,
                                                  save_checkpoint)
            opt_sh = opt_state_sharding(mesh, new_state.opt_state)
            opt_sharded = jax.device_put(new_state.opt_state, opt_sh)
            leaves = jax.tree_util.tree_leaves(opt_sharded)
            assert any(isinstance(l, jax.Array) and not l.is_fully_addressable
                       for l in leaves) == (info["process_count"] > 1), \
                "expected cross-process shards on a multi-process mesh"
            save_checkpoint(opt_ckpt, {
                "opt_state": flax.serialization.to_state_dict(opt_sharded)})
            opt_save_ok = True
            want = jax.tree_util.tree_leaves(
                flax.serialization.to_state_dict(new_state.opt_state))
            if pid == 0:
                got = jax.tree_util.tree_leaves(load_checkpoint(opt_ckpt))
                assert len(want) == len(got)
                for w, g in zip(want, got):
                    np.testing.assert_array_equal(np.asarray(w),
                                                  np.asarray(g))

            # orbax backend (the pod-preferred path, checkpoint.py
            # docstring): every process participates in a DISTRIBUTED
            # write of the same sharded tree — no gather, shards stream
            # from their owning process.  Restore is collective too in a
            # multi-process runtime (single-process restore deadlocks on
            # the orbax barriers), so every process restores and checks.
            save_checkpoint(opt_ckpt + ".orbax", {
                "opt_state": flax.serialization.to_state_dict(opt_sharded)},
                backend="orbax")
            got = jax.tree_util.tree_leaves(
                load_checkpoint(opt_ckpt + ".orbax"))
            assert len(want) == len(got)
            for w, g in zip(want, got):
                w = np.asarray(w)
                if isinstance(g, jax.Array) and not g.is_fully_addressable:
                    # restored sharded-as-saved: check the local shards
                    for shard in g.addressable_shards:
                        np.testing.assert_array_equal(
                            w[shard.index], np.asarray(shard.data))
                else:
                    np.testing.assert_array_equal(w, np.asarray(g))
    print("MPRESULT " + json.dumps({
        "pid": pid, "loss": loss, "checksum": checksum,
        "opt_save_ok": opt_save_ok,
        "process_count": info["process_count"],
        "global_devices": info["global_devices"],
        "local_devices": info["local_devices"]}), flush=True)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(n_proc, local_devices, opt_ckpt=""):
    sys.path.insert(0, _REPO)
    from __graft_entry__ import _widen_cpu_collective_watchdog

    env = dict(os.environ)
    env.update(PYTHONPATH=_REPO, JAX_PLATFORMS="cpu",
               XLA_FLAGS=f"--xla_force_host_platform_device_count"
                         f"={local_devices}")
    # workers run cross-process collectives + orbax barriers on virtual
    # devices sharing one core — widen the stuck-collective watchdog there
    # too (same root cause as conftest.py)
    _widen_cpu_collective_watchdog(env)
    if opt_ckpt:
        env["DIN_TEST_OPT_CKPT"] = opt_ckpt
    coord = f"localhost:{_free_port()}"
    procs = [subprocess.Popen(
        [sys.executable, _THIS, coord, str(n_proc), str(pid)],
        env=env, cwd=_REPO, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(n_proc)]
    results = []
    for pid, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker {pid} rc={p.returncode}:\n" \
                                  f"{err[-4000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("MPRESULT ")]
        assert line, f"worker {pid} printed no result:\n{out}\n{err[-2000:]}"
        results.append(json.loads(line[-1][len("MPRESULT "):]))
    return results


def test_two_process_step_matches_single_process(tmp_path):
    two = _launch(n_proc=2, local_devices=2,
                  opt_ckpt=str(tmp_path / "opt_sharded.ckpt"))
    assert all(r["process_count"] == 2 and r["global_devices"] == 4
               and r["local_devices"] == 2 for r in two), two
    assert all(r["opt_save_ok"] for r in two), two
    assert os.path.exists(tmp_path / "opt_sharded.ckpt")
    # both hosts observe the same replicated scalars
    assert abs(two[0]["loss"] - two[1]["loss"]) <= 1e-6 * abs(two[0]["loss"])
    assert abs(two[0]["checksum"] - two[1]["checksum"]) <= \
        1e-6 * abs(two[0]["checksum"])

    one = _launch(n_proc=1, local_devices=4)
    assert one[0]["process_count"] == 1 and one[0]["global_devices"] == 4
    # cross-process (gloo) vs in-process collectives: same program, same
    # inputs; allow only reduction-order noise (cf. test_parallel tolerances)
    assert abs(two[0]["loss"] - one[0]["loss"]) <= \
        1e-4 * abs(one[0]["loss"]), (two[0]["loss"], one[0]["loss"])
    assert abs(two[0]["checksum"] - one[0]["checksum"]) <= \
        2e-3 * abs(one[0]["checksum"]), \
        (two[0]["checksum"], one[0]["checksum"])


if __name__ == "__main__":
    _worker(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
