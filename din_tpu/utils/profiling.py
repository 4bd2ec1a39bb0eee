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
