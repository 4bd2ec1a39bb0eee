"""din_tpu — a TPU-native (JAX/XLA/Pallas) group-activity-recognition
framework with the capabilities of the DIN-Group-Activity-Recognition
benchmark (reference mounted at /root/reference).

Layering (see SURVEY.md §7):
  config      — dataclass Config + experiment presets
  data        — Volleyball / Collective parsers, samplers, host loader
  ops         — device kernels (RoIAlign/Pallas, resize, preprocessing)
  nn          — flax backbones + torch weight port
  heads       — reasoning modules (DIN, ARG, AT, PCTDM, HiGCIN, SACRF, TCE)
  models      — full stage-1 / stage-2 models
  train       — jitted train/eval engine, losses, metrics, checkpoints
  parallel    — device mesh + sharding for data-parallel training
"""

from din_tpu.config import Config

__version__ = "0.1.0"
__all__ = ["Config"]
