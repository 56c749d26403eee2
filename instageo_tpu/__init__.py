"""instageo-tpu: a TPU-native geospatial ML framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of InstaGeo
(instadeepai/InstaGeo-E2E-Geospatial-ML): chip creation from HLS/S2/S1
imagery, Prithvi ViT fine-tuning for segmentation/regression, streaming
evaluation, batched TPU serving, and a task-based web platform.

Subpackages are imported lazily; ``import instageo_tpu`` stays cheap so CLIs
and tests only pay for what they use.
"""

__version__ = "0.1.0"

__all__ = [
    "configs",
    "data",
    "models",
    "ops",
    "parallel",
    "serve",
    "train",
    "utils",
    "webapp",
]
