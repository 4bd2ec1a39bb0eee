"""Profiling / cost analysis.

The reference counts FLOPs with thop/fvcore probes and ``MAC2FLOP``
(utils.py:291-299, module __main__ blocks e.g. AT_infer_module.py:146-151)
and wall-clock with ``Timer``.  The TPU-native equivalents read compiled-HLO
cost analysis (exact for the program XLA actually runs) and wrap
``jax.profiler`` traces.
"""

from __future__ import annotations

import contextlib
from typing import Callable, Dict, Optional

import jax


def compiled_cost(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """FLOPs / bytes of the compiled program (from XLA cost analysis).

    Usage: ``compiled_cost(lambda v, b: model.apply(v, ...), variables, batch)``
    """
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):          # one entry per device program
        analysis = analysis[0]
    analysis = dict(analysis or {})
    return {
        "flops": float(analysis.get("flops", float("nan"))),
        "bytes_accessed": float(analysis.get("bytes accessed",
                                             analysis.get("bytes_accessed",
                                                          float("nan")))),
        "raw": analysis,
    }


def gflops(fn: Callable, *args, **kwargs) -> float:
    """GFLOPs of fn's compiled program (cf. MAC2FLOP, utils.py:291-299)."""
    return compiled_cost(fn, *args, **kwargs)["flops"] / 1e9


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def module_cost_report(model, variables, *args, name: str = "",
                       **kwargs) -> str:
    """One-line FLOPs/params report like the reference's __main__ probes."""
    g = gflops(lambda v: model.apply(v, *args, **kwargs), variables)
    p = param_count(variables.get("params", variables))
    return f"{name or type(model).__name__}: {g:.3f} GFLOPs  #Params: {p:,}"


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace scope (viewable in TensorBoard / Perfetto);
    no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _head_probes():
    """Reference-shape probes mirroring the modules' __main__ blocks
    (AT_infer_module.py:146-151, TCE_STBiP_module.py:373-408,
    dynamic_infer_module.py __main__): (name, module, example args)."""
    import jax.numpy as jnp
    import numpy as np

    from din_tpu.heads.arg import GCNModule
    from din_tpu.heads.at import ActorTransformer
    from din_tpu.heads.din import DynamicPersonInference
    from din_tpu.heads.higcin import CrossInferBlock
    from din_tpu.heads.pctdm import PCTDM
    from din_tpu.heads.sacrf_biute import SACRF, BiUTE
    from din_tpu.heads.tce import MultiHeadTCE

    rng = np.random.RandomState(0)
    B, T, N, C = 2, 10, 12, 1024
    x = jnp.asarray(rng.randn(B, T, N, C), jnp.float32)
    xbtn = x.reshape(B * T, N, C)
    boxes = jnp.asarray(
        np.stack([rng.uniform(0, 78, (B * T, N)),
                  rng.uniform(0, 43, (B * T, N)),
                  rng.uniform(0, 78, (B * T, N)),
                  rng.uniform(0, 43, (B * T, N))], -1), jnp.float32)
    ctx = jnp.asarray(rng.randn(B * T, 45, 80, 256), jnp.float32)
    return [
        ("DIN (Dynamic_Person_Inference)",
         DynamicPersonInference(in_dim=C), (x,)),
        ("ARG GCN_Module",
         GCNModule(num_features_gcn=C, num_features_relation=256,
                   num_graph=16, pos_threshold=0.2, out_w=80),
         (x.reshape(B, T * N, C),
          boxes.reshape(B, T, N, 4).reshape(B, T * N, 4))),
        ("Actor_Transformer", ActorTransformer(in_dim=C), (xbtn,)),
        ("PCTDM", PCTDM(num_players=N, input_size=C), (x,)),
        ("HiGCIN CrossInferBlock", CrossInferBlock(in_dim=C), (x,)),
        ("SACRF", SACRF(in_dim=C, num_actions=9, image_size=(720, 1280),
                        out_size=(45, 80)),
         (x, boxes.reshape(B, T, N, 4))),
        ("BiUTE", BiUTE(in_dim=C, num_boxes=N), (x,)),
        ("MultiHeadTCE", MultiHeadTCE(num_heads=2, num_layers=1,
                                      num_features_context=256),
         (xbtn, ctx)),
    ]


def main():
    """Per-head FLOP/param report at reference shapes — the TPU-native
    analogue of the reference modules' thop __main__ probes."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--head", default="all",
                    help="substring filter on head names")
    args = ap.parse_args()
    for name, mod, ex in _head_probes():
        if args.head != "all" and args.head.lower() not in name.lower():
            continue
        try:
            variables = mod.init(jax.random.PRNGKey(0), *ex)
            print(module_cost_report(mod, variables, *ex, name=name),
                  flush=True)
        except Exception as e:  # pragma: no cover - probe robustness
            print(f"{name}: FAILED {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
