"""Benchmark: training throughput + MFU of the flagship recipe on one chip.

Measures steady-state clips/sec of the full compiled training step
(backbone fwd+bwd + RoIAlign + head + loss + Adam) for the reference's
headline config — stage-2 DIN volleyball, VGG-16, T=10 frames, N=12 actors,
720x1280 input, lite_dim=128 (scripts/train_volleyball_stage2_dynamic.py) —
on synthetic device-resident batches (input pipeline excluded; it is
overlapped via host prefetch in real training).

MFU = compiled-HLO flops / step time / 197 TFLOP/s (TPU v5e bf16 peak);
exact for the program XLA actually runs (padding waste shows up as LOW MFU,
not as inflated flops).

``vs_baseline``: the reference publishes no throughput (BASELINE.md). The
comparison point is an analytic TITAN-RTX estimate for the same recipe:
VGG-16 at 720x1280 is ~285 GFLOP/frame forward, x3 for fwd+bwd, x10 frames
= ~8.6 TFLOP/clip; TITAN RTX fp32 peak 16.3 TFLOPS at ~50% utilisation
gives ~1.0 clip/sec.  vs_baseline = measured / 1.0.

Prints the primary JSON line to stdout TWICE: once immediately after the
flagship measurement (so a later timeout cannot lose it) and once as the
very last line (the driver reads the last parseable stdout line).  Fields:
{"metric", "value", "unit", "vs_baseline", "vs_baseline_basis", "mfu",
"mfu_useful", "step_ms", "hlo_tflop"}.  Secondary benches (collective DIN,
stage-1 inv3, HiGCIN, RoIAlign impl check, loader decode scaling) print
their own JSON lines to stderr; each is individually fenced so a failure
cannot take down the primary metric, and each is gated on a wall-clock
budget (DIN_TPU_BENCH_BUDGET_S, default 480 s) so the whole run stays
inside the driver's timeout — BENCH_r02 was rc=124 because the unbudgeted
long tail (loader device_put at ~13 MB/s over this environment's remote
tunnel) outlived it.  DIN_TPU_BENCH_FAST=1 skips all secondaries;
DIN_TPU_BENCH_FULL=1 additionally runs the loader-in-the-loop e2e bench
(excluded by default: tunnel-capped, ~10 min).

HLO flop counts (mfu / mfu_useful / secondary mfu) are constants of
(source, config, jax version), not measurements — they are cached in
``bench_flops_cache.json`` (committed) keyed by a fingerprint of all
three, so a budgeted run fills every mfu field instantly; on a
fingerprint miss the value is recomputed budget-gated and re-stored.
bench.py itself is excluded from the fingerprint (bump
_FLOPS_SCHEMA_VERSION when the flop-accounting logic changes meaning).

The measurement runs in a CHILD process under a supervising parent
(see _supervise): the remote TPU tunnel can wedge with the interpreter
blocked inside a C call, where no in-process watchdog fires.  On
deadline without a live number the supervisor emits the last real
measurement from committed ``bench_last_good.json``, labeled
``"stale": true`` with its commit/timestamp.
DIN_TPU_BENCH_NO_SUPERVISOR=1 runs in-process.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

TITAN_RTX_CLIPS_PER_SEC_EST = 1.0
VS_BASELINE_BASIS = ("analytic TITAN RTX estimate: ~8.6 TFLOP/clip fwd+bwd "
                     "at 50% fp32 util = 1.0 clip/s (reference publishes no "
                     "throughput, BASELINE.md)")
V5E_BF16_PEAK = 197e12
_T_START = time.perf_counter()


def _elapsed() -> float:
    return time.perf_counter() - _T_START


def _budget() -> float:
    # 480 s default: the driver's bench timeout is unknown (round-2 hit it
    # at rc=124); flagship + both MFU figures land well inside 480 s with
    # the persistent compile cache, and the secondary recipes are already
    # recorded in PERF.md — rc=0 with a parsed primary line beats a longer
    # tail.  Raise via env for full local captures.
    return float(os.environ.get("DIN_TPU_BENCH_BUDGET_S", "480"))


def _time_left(need_s: float, phase: str) -> bool:
    """True if `need_s` seconds plausibly fit in the remaining budget."""
    left = _budget() - _elapsed()
    if left < need_s:
        _log({"metric": "bench_phase_skipped", "phase": phase,
              "budget_s": _budget(), "elapsed_s": round(_elapsed(), 1),
              "needed_s": need_s})
        return False
    return True


def _sanitize(obj):
    """Replace non-finite floats with None: json.dumps would emit bare
    ``NaN``, which strict JSON parsers (and so possibly the driver) reject."""
    if isinstance(obj, dict):
        return {k: _sanitize(v) for k, v in obj.items()}
    if isinstance(obj, float) and not np.isfinite(obj):
        return None
    return obj


def _dumps(obj) -> str:
    return json.dumps(_sanitize(obj))


def _log(obj):
    print(_dumps(obj), file=sys.stderr)


# ---------------------------------------------------------------------------
# Compiled-HLO flop cache.  The flop counts are CONSTANTS of (code, config,
# jax version) — not measurements — but computing them costs AOT lowering +
# a correction-program compile (~minutes over this environment's remote
# tunnel), which is what kept mfu/mfu_useful out of budgeted runs.  The
# cache file is committed so the driver's bench run fills the mfu fields
# instantly; any source or config change invalidates the fingerprint and
# the value is recomputed (budget-gated) and re-stored.
_FLOPS_CACHE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_flops_cache.json")
_SRC_HASH = None


# Only sources that can change the TRACED PROGRAMS participate in the
# fingerprint: hashing the whole tree invalidated every committed cache
# entry on ANY commit (round 3's driver run recomputed mfu and skipped the
# collective recipe because serving-only edits had drifted the hash).
# bench.py itself is NOT hashed (supervisor/reporting edits must not drop
# the committed cache); _FLOPS_SCHEMA_VERSION is bumped by hand whenever
# the flop-accounting logic here (_backbone_body_flops / _chunk_correction
# wrappers) changes meaning.
_FLOPS_SCHEMA_VERSION = "1"
_PROGRAM_DIRS = ("models", "nn", "ops", "heads", "train", "parallel")
_PROGRAM_FILES = ("config.py", os.path.join("data", "synthetic.py"),
                  os.path.join("utils", "masking.py"))  # used in model fwds


def _source_hash() -> str:
    global _SRC_HASH
    if _SRC_HASH is None:
        import hashlib
        h = hashlib.sha1()
        h.update(_FLOPS_SCHEMA_VERSION.encode())
        root = os.path.dirname(os.path.abspath(__file__))
        files = [os.path.join(root, "__graft_entry__.py")]
        files.extend(os.path.join(root, "din_tpu", f)
                     for f in _PROGRAM_FILES)
        for d in _PROGRAM_DIRS:
            for dirpath, _dirnames, filenames in os.walk(
                    os.path.join(root, "din_tpu", d)):
                files.extend(os.path.join(dirpath, f)
                             for f in filenames if f.endswith(".py"))
        for f in sorted(files):
            with open(f, "rb") as fh:
                h.update(fh.read())
        _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


def _cfg_fingerprint(cfg) -> str:
    import hashlib

    import jax
    payload = "|".join([jax.__version__, _source_hash(), repr(cfg)])
    return hashlib.sha1(payload.encode()).hexdigest()[:16]


def _read_cache_hit(key: str, fp: str):
    """(cache_dict, hit_flops_or_None) for `key` at fingerprint `fp`."""
    try:
        with open(_FLOPS_CACHE_PATH) as f:
            cache = json.load(f)
    except Exception:
        cache = {}
    ent = cache.get(key)
    if isinstance(ent, dict) and ent.get("fp") == fp:
        return cache, float(ent["flops"])
    return cache, None


def _flops_cache_warm(key: str, cfg) -> bool:
    """True if the committed flop cache holds `key` at the CURRENT source
    fingerprint — i.e. the persistent compile cache was warmed for exactly
    this source tree + config and the recipe's compile will be a hit."""
    try:
        return _read_cache_hit(key, _cfg_fingerprint(cfg))[1] is not None
    except Exception:
        return False


def _cached_flops(key: str, cfg, compute_fn, need_s: float, phase: str):
    """Return (flops, from_cache).  Cache hit: instant.  Miss: compute if
    the wall-clock budget allows, store, return; else (nan, False)."""
    fp = _cfg_fingerprint(cfg)
    cache, hit = _read_cache_hit(key, fp)
    if hit is not None:
        return hit, True
    if not _time_left(need_s, phase):
        return float("nan"), False
    flops = compute_fn()
    if flops == flops:                           # not NaN
        cache[key] = {"fp": fp, "flops": flops}
        try:
            tmp = _FLOPS_CACHE_PATH + ".tmp"
            with open(tmp, "w") as f:
                json.dump(cache, f, indent=1, sort_keys=True)
            os.replace(tmp, _FLOPS_CACHE_PATH)
        except Exception as e:
            _log({"metric": "flops_cache_write_error", "error": str(e)[:200]})
    return flops, False


def _compiled_flops(step, *args) -> float:
    try:
        return _analysis_flops(step.lower(*args).compile())
    except Exception as e:  # pragma: no cover - cost analysis best-effort
        _log({"metric": "cost_analysis_error", "error": str(e)[:200]})
        return float("nan")


def _analysis_flops(compiled) -> float:
    try:
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(dict(analysis or {}).get("flops", float("nan")))
    except Exception as e:  # pragma: no cover - cost analysis best-effort
        _log({"metric": "cost_analysis_error", "error": str(e)[:200]})
        return float("nan")


def _backbone_body_flops(cfg, chunk):
    """HLO flops of ONE rematted backbone micro-batch fwd+bwd (the scan
    body).  XLA cost analysis counts a while body ONCE regardless of trip
    count, so the step-level number must be corrected by
    (num_chunks - 1) x body.  Mirrors cfg.remat_policy: 'early' remats
    inside the backbone (VGG), everything else wraps the whole body."""
    import jax
    import jax.numpy as jnp

    from din_tpu.nn.backbones import SAVEABLE_ACT, build_backbone

    H, W = cfg.image_size
    policy = getattr(cfg, "remat_policy", "full")
    if not getattr(cfg, "remat_backbone", True):
        policy = "none"                # body built without remat
    bb = build_backbone(cfg.backbone, dtype=jnp.dtype(cfg.compute_dtype),
                        folded_stem=getattr(cfg, "folded_stem", True),
                        remat_early=policy == "early")
    frames = jnp.zeros((chunk, H, W, 3), jnp.dtype(cfg.compute_dtype))
    variables = bb.init(jax.random.PRNGKey(0), frames, False)

    def loss(params, x):
        apply = lambda p, xx: sum(
            o.astype(jnp.float32).sum()
            for o in bb.apply({"params": p,
                               **({"batch_stats": variables["batch_stats"]}
                                  if "batch_stats" in variables else {})},
                              xx, False))
        if policy == "save_deep":
            # mirror _BackboneStep's nn.remat policy (trunk.py:74-77) so the
            # per-chunk flop correction counts save_deep's early-chain
            # recompute (deep activations are saved, not recomputed)
            return jax.checkpoint(
                apply,
                policy=jax.checkpoint_policies.save_only_these_names(
                    SAVEABLE_ACT))(params, x)
        if policy == "full" or (policy == "early"
                                and not getattr(bb, "remat_early", False)):
            return jax.checkpoint(apply)(params, x)
        return apply(params, x)

    g = jax.jit(jax.grad(loss, argnums=0))
    return _compiled_flops(g, variables["params"], frames)


def _build_step(cfg):
    """Build the full train step for cfg; returns (step, state, batch)."""
    import jax

    from __graft_entry__ import _make_batch
    from din_tpu.models.registry import build_model
    from din_tpu.train.engine import TrainState, init_model, make_train_step
    from din_tpu.train.optim import make_optimizer

    t0 = time.perf_counter()
    model = build_model(cfg)
    batch = _make_batch(cfg, batch_size=cfg.batch_size)
    def sync(tree):
        # block_until_ready does not reliably block over the remote tunnel
        # (CLAUDE.md) — force a host transfer of one leaf as the sync point
        leaves = [x for x in jax.tree_util.tree_leaves(tree)
                  if hasattr(x, "ravel")]
        if leaves:
            float(jax.numpy.asarray(leaves[0]).ravel()[0])

    t1 = time.perf_counter()
    variables = init_model(cfg, model, batch)
    sync(variables["params"])
    t2 = time.perf_counter()
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=jax.jit(tx.init)(variables["params"]),
                       rng=jax.random.PRNGKey(0))
    sync(state.opt_state)
    _log({"metric": "build_breakdown_s",
          "batch_s": round(t1 - t0, 1), "init_s": round(t2 - t1, 1),
          "opt_s": round(time.perf_counter() - t2, 1)})
    step = make_train_step(model, cfg, tx,
                           frame0_labels=cfg.training_stage == 2,
                           has_bn=bool(variables.get("batch_stats")),
                           donate=False)
    return step, state, batch


def _chunk_correction(cfg):
    """Extra flops from the scan body running (num_chunks - 1) more times
    than XLA cost analysis counts it."""
    from din_tpu.models.trunk import Trunk

    n_frames = cfg.batch_size * cfg.num_frames
    chunk = Trunk(backbone=cfg.backbone, out_size=tuple(cfg.out_size),
                  crop_size=tuple(cfg.crop_size),
                  train_backbone=cfg.train_backbone,
                  frame_chunk=cfg.frame_chunk)._auto_chunk(
        n_frames, *cfg.image_size)
    num_chunks = n_frames // chunk
    if num_chunks > 1 and cfg.train_backbone:
        return (num_chunks - 1) * _backbone_body_flops(cfg, chunk)
    return 0.0


def _step_flops(cfg, step, state, dbatch):
    """Corrected compiled-HLO flops of the step (scan body x trip count)."""
    return _compiled_flops(step, state, dbatch) + _chunk_correction(cfg)


def _bench_train_step(cfg, warmup=3, iters=10):
    """Build + time the full train step for cfg.

    Returns (dt, loss, flops_fn): the step runs through plain jit — ONE
    compile before the timing loop, and the executable is written to the
    persistent compilation cache (_enable_compile_cache) so the driver's
    own bench run can reuse it.  ``flops_fn()`` lazily computes the
    corrected compiled-HLO flops: its AOT lowering of the same program hits
    the just-warmed compilation cache, and deferring it keeps every
    compile except the essential one behind the primary emit.
    """
    import jax

    tb = time.perf_counter()
    step, state0, batch = _build_step(cfg)
    dbatch = jax.device_put(batch)
    _log({"metric": "build_s", "value": round(time.perf_counter() - tb, 1),
          "recipe": "%s/%s" % (cfg.backbone, cfg.inference_module_name)})
    t0 = time.perf_counter()
    state, metrics = step(state0, dbatch)
    # NOTE: device->host transfer (float()) is the sync point; the remote
    # device tunnel used in this environment does not honour
    # block_until_ready reliably.
    _ = float(metrics["loss"])
    _log({"metric": "compile_s", "value": round(time.perf_counter() - t0, 1),
          "recipe": "%s/%s" % (cfg.backbone, cfg.inference_module_name)})
    for _i in range(warmup):
        state, metrics = step(state, dbatch)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _i in range(iters):
        state, metrics = step(state, dbatch)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters

    def flops_fn():
        return _compiled_flops(step, state0, dbatch) + _chunk_correction(cfg)

    return dt, float(metrics["loss"]), flops_fn


def _flagship():
    import jax

    from __graft_entry__ import _flagship_cfg

    # throughput config: batch 4 clips (40 frames), 8-frame backbone
    # micro-batches (sublane-aligned, fits HBM with remat)
    cfg = _flagship_cfg(tiny=False).replace(batch_size=4, frame_chunk=8)
    dt, loss, flops_fn = _bench_train_step(cfg)
    clips = cfg.batch_size / dt
    _log({"metric": "flagship_loss", "value": loss})

    def fill_mfu(primary):
        # exact flops: a (code, config) constant — instant on a
        # bench_flops_cache.json hit; on miss, AOT relowering + the
        # scan-body correction compile, budget-gated and re-stored.
        # Deferred behind the first primary emit so a slow tunnel cannot
        # cost the round its headline number.
        try:
            flops, _hit = _cached_flops("flagship_executed", cfg,
                                        flops_fn, 300, "mfu")
            if flops == flops:
                primary["mfu"] = round(flops / dt / V5E_BF16_PEAK, 4)
                primary["hlo_tflop"] = round(flops / 1e12, 3)
        except Exception as e:
            _log({"metric": "mfu_error", "error": str(e)[:200]})

    def mfu_useful():
        # useful-MFU: the folded stem executes 2x structural-zero stem
        # flops, so the executed-HLO MFU overstates useful work.  Count the
        # CANONICAL program's flops against the same dt (a constant too —
        # cached; a miss costs a second model build + compile; the
        # canonical program is never stepped).
        try:
            ccfg = cfg.replace(folded_stem=False)

            def compute():
                cstep, cstate, cbatch = _build_step(ccfg)
                return _step_flops(ccfg, cstep, cstate,
                                   jax.device_put(cbatch))

            cflops, _hit = _cached_flops("flagship_canonical", ccfg,
                                         compute, 300, "mfu_useful")
            return cflops / dt / V5E_BF16_PEAK
        except Exception as e:
            _log({"metric": "mfu_useful_error", "error": str(e)[:200]})
            return float("nan")

    return cfg, clips, fill_mfu, mfu_useful, {
        "metric": "train_clips_per_sec_din_vgg16_t10_bs%d" % cfg.batch_size,
        "value": round(clips, 3),
        "unit": "clips/sec/chip",
        "vs_baseline": round(clips / TITAN_RTX_CLIPS_PER_SEC_EST, 3),
        "vs_baseline_basis": VS_BASELINE_BASIS,
        "mfu": float("nan"),            # filled in by main() post-emit
        "mfu_useful": float("nan"),     # filled in by main() post-emit
        "step_ms": round(dt * 1e3, 1),
        "hlo_tflop": float("nan"),      # filled in by main() post-emit
    }


class _JpegClips:
    """Synthetic on-disk JPEG dataset at full flagship geometry: every
    __getitem__ decodes T real 720x1280 JPEG files through the native
    batch decoder (din_tpu/native) exactly like the real datasets."""

    def __init__(self, tmpdir, cfg, n_clips=16, pool=12, cache=None):
        import numpy as np
        from PIL import Image

        self.cfg = cfg
        self.n_clips = n_clips
        rng = np.random.RandomState(0)
        H, W = cfg.image_size
        self.paths = []
        base_y = np.linspace(0, 255, H, dtype=np.float32)[:, None, None]
        base_x = np.linspace(0, 255, W, dtype=np.float32)[None, :, None]
        for i in range(pool):
            img = (base_y * rng.rand() + base_x * rng.rand()
                   + rng.rand(1, 1, 3) * 64) % 255
            noise = rng.randint(0, 32, (H // 8, W // 8, 3)).astype(np.float32)
            img = np.clip(img + np.kron(noise, np.ones((8, 8, 1))), 0, 255)
            p = f"{tmpdir}/{i}.jpg"
            Image.fromarray(img.astype("uint8")).save(p, quality=90)
            self.paths.append(p)
        self._rng = rng
        self.cache = cache

    def __len__(self):
        return self.n_clips

    def __getitem__(self, i):
        import numpy as np

        from din_tpu import native

        cfg = self.cfg
        T, N = cfg.num_frames, cfg.num_boxes
        OH, OW = cfg.out_size
        paths = [self.paths[(i + t) % len(self.paths)] for t in range(T)]
        if self.cache is not None:
            images = self.cache.load_frames(paths, *cfg.image_size)
        else:
            images = native.load_frames(paths, *cfg.image_size)
        # labels/boxes generated directly (NOT via _make_batch, whose
        # full-image randint costs ~240 ms/clip and would dominate any
        # loader measurement)
        rng = np.random.RandomState(i)
        x1 = rng.uniform(0, max(OW - 2, 1), (T, N))
        y1 = rng.uniform(0, max(OH - 2, 1), (T, N))
        return {"images": images,
                "boxes": np.stack([x1, y1, x1 + 1.5, y1 + 1.5],
                                  -1).astype(np.float32),
                "actions": rng.randint(0, cfg.num_actions,
                                       (T, N)).astype(np.int32),
                "activities": rng.randint(0, cfg.num_activities,
                                          (T,)).astype(np.int32)}


def _loader_in_loop(cfg, device_resident_clips):
    """End-to-end steps/sec with JPEG decode in the loop (decode-ahead ring
    buffer + host->device prefetch); target: within 10% of device-resident."""
    import shutil
    import tempfile

    from din_tpu.data.loader import BatchLoader, prefetch_to_device

    tmpdir = tempfile.mkdtemp(prefix="din_bench_jpeg_")
    try:
        ds = _JpegClips(tmpdir, cfg, n_clips=8 * cfg.batch_size)
        step, state, _batch = _build_step(cfg)    # one shared construction
        workers = max(4, min(8, os.cpu_count() or 4))
        loader = BatchLoader(ds, cfg.batch_size, shuffle=True,
                             num_workers=workers)
        # host-side pipeline alone (decode + stack, no device transfer):
        # this is the part the framework owns; it must be faster than the
        # device step so prefetch can hide it
        for _b in iter(loader):
            pass                                   # decode warm-up
        t0 = time.perf_counter()
        n = 0
        for _b in iter(loader):
            n += cfg.batch_size
        decode_clips = n / (time.perf_counter() - t0)
        # warm epoch (compile + decode warm-up)
        for b in prefetch_to_device(iter(loader), size=2):
            state, m = step(state, b)
        _ = float(m["loss"])
        t0 = time.perf_counter()
        n = 0
        for b in prefetch_to_device(iter(loader), size=2):
            state, m = step(state, b)
            n += cfg.batch_size
        _ = float(m["loss"])
        dt = time.perf_counter() - t0
        clips = n / dt
        _log({"metric": "train_clips_per_sec_loader_in_loop",
              "value": round(clips, 3), "unit": "clips/sec/chip",
              "fraction_of_device_resident":
                  round(clips / max(device_resident_clips, 1e-9), 3),
              "host_decode_clips_per_sec": round(decode_clips, 3),
              "decode_workers": workers,
              # NOTE: in this environment the chip is behind a remote
              # tunnel; jax.device_put runs at ~13 MB/s (7.5 s per 110 MB
              # uint8 batch), which caps the end-to-end number.  On a real
              # TPU host (PCIe) the decode rate above is the binding term.
              "note": "end-to-end capped by remote-tunnel device_put"})
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def _secondary_recipes():
    """Collective DIN (the CAD-family number) first, then stage-1 inv3 and
    HiGCIN (K=7).  Each recipe is budget-gated: ~240 s covers its build +
    compile + 5 timed steps over the tunnel."""
    from din_tpu.experiments.presets import PRESETS

    recipes = (
        # Collective stage-2 DIN (res18, 480x720, masked MAX_N=13)
        ("train_clips_per_sec_collective_dynamic_bs4",
         lambda: PRESETS["collective_stage2_dynamic"]().replace(
             batch_size=4, frame_chunk=8)),
        # stage-1 volleyball inv3 at 87x157 (scripts/train_volleyball_stage1.py)
        ("train_clips_per_sec_stage1_vgg16_bs4",
         lambda: PRESETS["volleyball_stage1"]().replace(
             batch_size=4, frame_chunk=6)),
        # HiGCIN stage-2 (K=7 cross-infer blocks)
        ("train_clips_per_sec_higcin_bs4",
         lambda: PRESETS["volleyball_stage2_higcin"]().replace(
             batch_size=4, frame_chunk=8)),
    )
    for name, make_cfg in recipes:
        # a flop-cache fingerprint hit proves THIS source+config was warmed
        # (bench_flops_cache.json is committed together with .jax_cache),
        # so compile will be a persistent-cache hit: build+steps only.
        cfg = make_cfg()
        need = 120 if _flops_cache_warm(name, cfg) else 240
        if not _time_left(need, name):
            continue
        try:
            dt, _, flops_fn = _bench_train_step(cfg, warmup=1, iters=3)
            frames_per_clip = cfg.num_frames
            clips = cfg.batch_size / dt
            # stage-1 samples single frames in the reference; here T frames
            # per clip either way — report clips/sec at this T
            rec = {"metric": name, "value": round(clips, 3),
                   "unit": "clips/sec/chip (T=%d)" % frames_per_clip,
                   "step_ms": round(dt * 1e3, 1)}
            flops, _hit = _cached_flops(name, cfg, flops_fn, 180,
                                        name + "_mfu")
            if flops == flops:
                rec["mfu"] = round(flops / dt / V5E_BF16_PEAK, 4)
            _log(rec)
        except Exception as e:
            _log({"metric": name, "error": str(e)[:300]})


def _loader_decode_scaling(cfg):
    """Host-side decode throughput vs worker count (no device transfer): the
    part of the input pipeline the framework owns.  Evidence for whether the
    loader can feed the chip at a given core count — the loader-in-loop e2e
    number is tunnel-capped in this environment (see _loader_in_loop)."""
    import shutil
    import tempfile

    from din_tpu.data.loader import BatchLoader

    tmpdir = tempfile.mkdtemp(prefix="din_bench_decode_")
    try:
        ds = _JpegClips(tmpdir, cfg, n_clips=4 * cfg.batch_size)
        cores = os.cpu_count() or 1
        worker_counts = sorted({1, 2, 4, 8, cores} & set(range(1, 33)))
        rates = {}
        for w in worker_counts:
            if not _time_left(60, f"decode_scaling_w{w}"):
                break
            loader = BatchLoader(ds, cfg.batch_size, shuffle=False,
                                 num_workers=w)
            for _b in iter(loader):
                pass                               # warm-up epoch
            t0 = time.perf_counter()
            n = 0
            for _b in iter(loader):
                n += cfg.batch_size
            rates[str(w)] = round(n / (time.perf_counter() - t0), 3)
        _log({"metric": "loader_clips_per_sec_scaled",
              "unit": "clips/sec (host decode only, T=%d @ %dx%d)"
                      % (cfg.num_frames, *cfg.image_size),
              "host_cores": cores,
              "clips_per_sec_by_workers": rates})
        if _time_left(60, "decode_cache_rate"):
            # steady-state epochs with the decoded-frame LRU cache
            # (cfg.decode_cache_mb, din_tpu/data/cache.py): epoch 1 fills,
            # epoch 2+ skips decode entirely
            from din_tpu.data.cache import FrameCache
            cds = _JpegClips(tmpdir, cfg, n_clips=4 * cfg.batch_size,
                             cache=FrameCache(budget_mb=256))
            loader = BatchLoader(cds, cfg.batch_size, shuffle=False,
                                 num_workers=min(4, cores))
            for _b in iter(loader):
                pass                               # fill epoch
            t0 = time.perf_counter()
            n = 0
            for _b in iter(loader):
                n += cfg.batch_size
            _log({"metric": "loader_clips_per_sec_cached",
                  "value": round(n / (time.perf_counter() - t0), 3),
                  "unit": "clips/sec (host, warm decode cache)",
                  "cache_hit_rate": round(
                      cds.cache.hits / max(1, cds.cache.hits
                                           + cds.cache.misses), 3)})
        if _time_left(60, "packed_store_rate"):
            # decode-free path: frames pre-decoded into the mmap store
            # (cfg.packed_frames_path, din_tpu/data/packed.py)
            from din_tpu.data.packed import PackedFrameStore, pack_frames
            pack_path = os.path.join(tmpdir, "frames.pack")
            pack_frames(tmpdir, pack_path, *cfg.image_size)
            pds = _JpegClips(tmpdir, cfg, n_clips=4 * cfg.batch_size,
                             cache=PackedFrameStore(pack_path, root=tmpdir))
            loader = BatchLoader(pds, cfg.batch_size, shuffle=False,
                                 num_workers=min(4, cores))
            for _b in iter(loader):
                pass                               # page-cache warm-up
            t0 = time.perf_counter()
            n = 0
            for _b in iter(loader):
                n += cfg.batch_size
            _log({"metric": "loader_clips_per_sec_packed",
                  "value": round(n / (time.perf_counter() - t0), 3),
                  "unit": "clips/sec (host, mmap packed store)",
                  "store_misses": pds.cache.misses})
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def _inference_bench(cfg):
    """Serving throughput: the compiled fwd-only program
    (experiments/predict.py Predictor — backbone + RoIAlign + head +
    softmax, no loss/optimizer) at flagship geometry.  The reference has
    no serving path at all (SURVEY.md L4); this documents ours.
    Predictor.__call__ copies posteriors to host, which doubles as the
    sync point for tunnel-safe timing."""
    from __graft_entry__ import _make_batch
    from din_tpu.experiments.predict import Predictor
    from din_tpu.models.registry import build_model
    from din_tpu.train.engine import init_model

    import jax

    model = build_model(cfg)
    batch = _make_batch(cfg, batch_size=cfg.batch_size)
    variables = init_model(cfg, model, batch)
    pred = Predictor(cfg, variables)
    # device-resident inputs: the timed region measures the chip's serving
    # rate, not this environment's remote-tunnel host->device copy (a real
    # deployment overlaps the input DMA via prefetch, data/loader.py)
    images, boxes = jax.device_put((batch["images"], batch["boxes"]))
    t0 = time.perf_counter()
    pred(images, boxes)
    _log({"metric": "inference_compile_s",
          "value": round(time.perf_counter() - t0, 1)})
    for _ in range(2):
        pred(images, boxes)
    iters = 10

    def timed_median(fn):
        # median of per-call times: a single multi-second tunnel stall
        # inside the block must not poison the reported rate (observed:
        # a 26 s outlier turned 19.7 clips/s into "0.305")
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn()
            times.append(time.perf_counter() - t0)
        return sorted(times)[len(times) // 2], out

    dt, out = timed_median(lambda: pred(images, boxes))
    assert "activities" in out
    _log({"metric": "infer_clips_per_sec_flagship",
          "value": round(cfg.batch_size / dt, 3),
          "unit": "clips/sec/chip (fwd-only, bs%d)" % cfg.batch_size,
          "step_ms": round(dt * 1e3, 1)})
    # batch scaling: fwd-only stores no remat residuals, so serving admits
    # batches the training step cannot fit — measure the amortisation
    if not _time_left(180, "inference_bs_scaling"):
        return
    big = 2 * cfg.batch_size
    bbatch = _make_batch(cfg, batch_size=big)
    bimages, bboxes = jax.device_put((bbatch["images"], bbatch["boxes"]))
    pred(bimages, bboxes)                        # compile
    for _ in range(2):
        pred(bimages, bboxes)
    bdt, _out = timed_median(lambda: pred(bimages, bboxes))
    _log({"metric": "infer_clips_per_sec_flagship_bs%d" % big,
          "value": round(big / bdt, 3),
          "unit": "clips/sec/chip (fwd-only, bs%d)" % big,
          "step_ms": round(bdt * 1e3, 1)})


def _roi_align_check():
    """On-device RoIAlign impl check: assert pallas == onehot (and gather ==
    onehot) + time the impls at the stage-2 (45x80) and stage-1 inv3
    (87x157) geometries.  The Pallas kernel only covers maps whose per-frame
    block fits VMEM, so it is checked at 45x80 only."""
    import jax
    import jax.numpy as jnp

    from din_tpu.ops.roi_align import roi_align

    rng = np.random.RandomState(0)
    for OH, OW, D in ((45, 80, 512), (87, 157, 1056)):
        BT, N, K = 8, 12, 5
        feats = jnp.asarray(rng.randn(BT, OH, OW, D), jnp.bfloat16)
        x1 = rng.uniform(0, OW - 3, (BT, N))
        y1 = rng.uniform(0, OH - 3, (BT, N))
        boxes = jnp.asarray(np.stack([x1, y1, x1 + 2.5, y1 + 2.7], -1),
                            jnp.float32)
        outs, times = {}, {}
        impls = ("pallas", "onehot", "gather") if OH * OW <= 4096 \
            else ("onehot", "gather")
        for impl in impls:
            try:
                f = jax.jit(lambda ft, bx, impl=impl: roi_align(
                    ft, bx, (K, K), impl=impl))
                out = f(feats, boxes)
                _ = float(out.astype(jnp.float32).sum())
                t0 = time.perf_counter()
                for _i in range(10):
                    out = f(feats, boxes)
                _ = float(out.astype(jnp.float32).sum())
                times[impl] = (time.perf_counter() - t0) / 10
                outs[impl] = np.asarray(out.astype(jnp.float32))
            except Exception as e:
                _log({"metric": f"roi_align_{impl}_{OH}x{OW}",
                      "error": str(e)[:200]})
        ref_impl = "onehot"
        for other in ("pallas", "gather"):
            if other in outs and ref_impl in outs:
                diff = float(np.abs(outs[other] - outs[ref_impl]).max())
                assert diff < 0.1, f"{other} vs onehot mismatch: {diff}"
        _log({"metric": f"roi_align_impls_{OH}x{OW}",
              "max_abs_diff_vs_onehot": {
                  k: float(np.abs(outs[k] - outs[ref_impl]).max())
                  for k in outs if k != ref_impl},
              "times_ms": {k: round(v * 1e3, 3) for k, v in times.items()}})


def _enable_compile_cache():
    """Persistent XLA compilation cache under the repo: flagship-size
    programs can take many minutes to compile over this environment's
    remote-device tunnel, and the driver's bench run repeats the exact
    programs this session already compiled.  Best-effort (remote backends
    may not support it)."""
    try:
        import jax
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   os.path.join(os.path.dirname(
                                       os.path.abspath(__file__)),
                                       ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # pragma: no cover
        _log({"metric": "compile_cache_error", "error": str(e)[:200]})


# ---------------------------------------------------------------------------
# Supervisor: the measurement itself runs in a CHILD process under a hard
# deadline.  This environment reaches its TPU through a remote tunnel that
# can wedge such that backend init or a compile blocks forever inside C
# code (observed rounds 2-4) — in-process watchdogs (SIGALRM) cannot fire
# while the interpreter is stuck in a C call, so the only reliable guard is
# a separate supervising process.  If the child produces no primary line
# before the deadline, the supervisor emits the last REAL on-chip
# measurement from ``bench_last_good.json`` explicitly labeled
# ``"stale": true`` with the commit/time it was measured at — an honestly
# flagged historical number beats an rc=124 with no output (BENCH_r02).

_LAST_GOOD_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_last_good.json")


def _git_head() -> str:
    try:
        import subprocess
        return subprocess.check_output(
            ["git", "-C", os.path.dirname(os.path.abspath(__file__)),
             "rev-parse", "--short", "HEAD"],
            stderr=subprocess.DEVNULL).decode().strip()
    except Exception:
        return "unknown"


def _record_last_good(primary: dict):
    """Persist a successful flagship measurement for the stale fallback."""
    try:
        entry = dict(primary)
        entry["measured_at_commit"] = _git_head()
        entry["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                             time.gmtime())
        tmp = _LAST_GOOD_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f, indent=1, sort_keys=True)
        os.replace(tmp, _LAST_GOOD_PATH)
    except Exception as e:  # pragma: no cover
        _log({"metric": "last_good_write_error", "error": str(e)[:200]})


def _stale_fallback_line():
    """The stale-labeled primary line, or None if no recorded measurement."""
    try:
        with open(_LAST_GOOD_PATH) as f:
            entry = json.load(f)
    except Exception:
        return None
    entry["stale"] = True
    entry["stale_reason"] = (
        "no live measurement: the TPU tunnel was unreachable/wedged at "
        "bench time; value is the last real on-chip measurement "
        "(see measured_at/measured_at_commit)")
    return _dumps(entry)


def _is_primary_line(line: str):
    """Parse a child stdout line; return the dict if it is a primary metric."""
    try:
        obj = json.loads(line)
    except Exception:
        return None
    if isinstance(obj, dict) and "metric" in obj and "value" in obj:
        return obj
    return None


def _supervise(child_cmd=None, deadline_s=None) -> int:
    """Run the bench child under a hard deadline, forwarding its output.

    Returns the exit code.  On deadline with no primary line from the
    child: kill the child (by pid) and emit the stale fallback.
    """
    import subprocess
    import threading

    if child_cmd is None:
        child_cmd = [sys.executable, os.path.abspath(__file__)]
    if deadline_s is None:
        # budget + slack: the child's own phase gating targets _budget();
        # the supervisor only fires when the child is WEDGED, not slow.
        deadline_s = _budget() + 120.0
    env = dict(os.environ, DIN_TPU_BENCH_CHILD="1")
    proc = subprocess.Popen(child_cmd, env=env, stdout=subprocess.PIPE,
                            text=True, bufsize=1)
    last_primary = []

    def pump():
        for line in proc.stdout:
            line = line.rstrip("\n")
            print(line, flush=True)
            obj = _is_primary_line(line)
            if obj is not None:
                last_primary.append(obj)

    t = threading.Thread(target=pump, daemon=True)
    t.start()
    try:
        rc = proc.wait(timeout=deadline_s)
        t.join(timeout=30)
    except subprocess.TimeoutExpired:
        _log({"metric": "bench_supervisor_deadline", "deadline_s": deadline_s,
              "had_primary": bool(last_primary)})
        proc.kill()
        proc.wait()
        # drain the pump BEFORE any fallback print: a late child line after
        # the stale-labeled line would become the driver's "last stdout
        # line" (its parse contract) — the join orders the output
        t.join(timeout=30)
        rc = 0 if last_primary else 1
    if last_primary and last_primary[-1].get("value") is not None \
            and not last_primary[-1].get("stale"):
        _record_last_good(last_primary[-1])
        return rc if rc is not None else 0
    fallback = _stale_fallback_line()
    if fallback is not None:
        print(fallback, flush=True)
        return 0
    return rc if rc else 1


def main():
    _enable_compile_cache()
    cfg, clips, fill_mfu_fn, mfu_useful_fn, primary = _flagship()
    # emit the primary metric IMMEDIATELY (flushed): if anything below runs
    # past the driver's timeout, the number is already on stdout.  The same
    # line is printed again at the end — the driver reads the last parseable
    # stdout line, so the early duplicate costs nothing (BENCH_r02 lesson).
    print(_dumps(primary), flush=True)
    # budget checks live inside (cache hits are instant, misses are gated)
    fill_mfu_fn(primary)
    print(_dumps(primary), flush=True)
    mu = mfu_useful_fn()
    if mu == mu:
        primary["mfu_useful"] = round(mu, 4)
        print(_dumps(primary), flush=True)
    if os.environ.get("DIN_TPU_BENCH_FAST") != "1":
        _secondary_recipes()
        if _time_left(150, "inference_bench"):
            try:
                _inference_bench(cfg)
            except Exception as e:
                _log({"metric": "inference_bench", "error": str(e)[:300]})
        if _time_left(120, "roi_align_check"):
            try:
                _roi_align_check()
            except Exception as e:
                _log({"metric": "roi_align_check", "error": str(e)[:300]})
        if _time_left(90, "loader_decode_scaling"):
            try:
                _loader_decode_scaling(cfg)
            except Exception as e:
                _log({"metric": "loader_decode_scaling",
                      "error": str(e)[:300]})
        # loader-in-loop e2e is opt-in: tunnel device_put (~13 MB/s) makes it
        # ~10 min of wall clock that measures the tunnel, not the framework
        if os.environ.get("DIN_TPU_BENCH_FULL") == "1" \
                and _time_left(600, "loader_in_loop"):
            try:
                _loader_in_loop(cfg, clips)
            except Exception as e:
                _log({"metric": "loader_in_loop", "error": str(e)[:300]})
    # the primary metric is the LAST line, on stdout (driver contract)
    print(_dumps(primary), flush=True)


if __name__ == "__main__":
    if os.environ.get("DIN_TPU_BENCH_CHILD") == "1" \
            or os.environ.get("DIN_TPU_BENCH_NO_SUPERVISOR") == "1":
        main()
    else:
        sys.exit(_supervise())
