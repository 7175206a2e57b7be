"""vitrs_tpu — a TPU-native Vision Transformer framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of
Simon-Kotchou/ViT.rs (the llm.c-inspired Rust transformer), designed for TPU:
MXU-shaped matmuls, Pallas flash attention, fused AdamW, shard_map data
parallelism over ICI, and a host-side native data pipeline.
"""

from .config import ViTConfig, get_config, PRESETS
from .vit import ViT
from . import params
from . import checkpoint

__version__ = "0.1.0"
