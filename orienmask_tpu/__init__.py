"""OrienMask-TPU: a TPU-native rebuild of the OrienMask instance segmentation framework.

Same capability surface as the PyTorch/CUDA reference (duwt/OrienMask): config-driven
training, COCO evaluation, and single-image/batch inference with visualization — built
as an idiomatic JAX/XLA stack (NHWC layouts, static shapes, fused jit programs, pjit
data parallelism over a device mesh).

Layer map (mirrors reference SURVEY.md §1):
  config/   — declarative nested-dict configs, inheritance via construct_config
  models/   — DarkNet-53 backbone + OrienMaskYOLO / OrienMaskYOLOFPNPlus heads
  ops/      — decode / NMS / orientation-mask assembly / loss / target builder
  data/     — COCO/VOC datasets, numpy+cv2 augmentations, static-shape collate
  optim/    — SGD + warmup LR schedules (per-iteration, like the reference)
  parallel/ — device mesh + sharding rules (data-parallel over TPU ICI)
  trainer/  — builder registry, train/val/test loops, checkpointing
  eval/     — COCO metrics (pure-python RLE + lite COCOeval), counters
  utils/    — env helpers, block_until_ready timers, visualizer
  native/   — C++ host-side kernels (RLE encode, NMS, resize) via ctypes
"""

__version__ = "0.1.0"
