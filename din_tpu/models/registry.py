"""Model registry.

reference: train_net.py:63-64 (stage-1 + legacy), train_net_dynamic.py:65-73
(stage-2 registry keyed by ``inference_module_name``).
"""

from __future__ import annotations

from din_tpu.models.base import BasenetCollective, BasenetVolleyball
from din_tpu.models.baselines import (ARGVolleyball, ATVolleyball,
                                      GCNNetCollective, GCNNetVolleyball,
                                      HiGCINVolleyball, PCTDMVolleyball,
                                      SACRFBiUTEVolleyball)
from din_tpu.models.dynamic import (DynamicCollective, DynamicTCEVolleyball,
                                    DynamicVolleyball)

BASENET_MODELS = {
    "volleyball": BasenetVolleyball,
    "collective": BasenetCollective,
}

# legacy stage-2 GCN trainer (train_net.py:64)
GCNNET_MODELS = {
    "volleyball": GCNNetVolleyball,
    "collective": GCNNetCollective,
}

# stage-2 registry (train_net_dynamic.py:66-73)
STAGE2_MODELS = {
    "dynamic_volleyball": DynamicVolleyball,
    "dynamic_tce_volleyball": DynamicTCEVolleyball,
    "pctdm_volleyball": PCTDMVolleyball,
    "higcin_volleyball": HiGCINVolleyball,
    "at_volleyball": ATVolleyball,
    "arg_volleyball": ARGVolleyball,
    "sacrf_biute_volleyball": SACRFBiUTEVolleyball,
    "dynamic_collective": DynamicCollective,
    "gcnnet_volleyball": GCNNetVolleyball,
    "gcnnet_collective": GCNNetCollective,
}


def build_model(cfg):
    """Dispatch per the reference's trainer logic (train_net_dynamic.py:75-93)."""
    if cfg.training_stage == 1:
        return BASENET_MODELS[cfg.dataset_name](cfg=cfg)
    if cfg.training_stage == 2:
        return STAGE2_MODELS[cfg.inference_module_name](cfg=cfg)
    raise ValueError(f"unknown training stage {cfg.training_stage}")
