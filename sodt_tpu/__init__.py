"""sodt_tpu — TPU-native small-object-detection transformers.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Bissmella/Small-object-detection-transformers (multimodal cross-channel
attention detector for VEDAI aerial imagery, ICIP 2024): enhanced-SWIN
backbone with cross-channel RGB/IR attention fusion, YOLOv5-style C3 neck +
anchor Detect head, super-resolution auxiliary branch, full train/eval
runtimes — redesigned TPU-first (NHWC layouts, bf16 MXU matmuls, fixed-shape
jitted train/eval steps, mesh/pjit data parallelism, on-device NMS and
augmentation).

Reference layer map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
