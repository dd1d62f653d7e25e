"""gnnome_tpu — TPU-native learned genome assembly.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
lvrcek/GNNome-assembly: GatedGCN edge classification over assembly graphs
plus greedy decoding into contigs. See README.md for the design.
"""
from gnnome_tpu.config import (
    Config,
    DataConfig,
    DecodeConfig,
    ModelConfig,
    SplitConfig,
    TrainConfig,
)

__version__ = "0.1.0"

__all__ = [
    "Config", "ModelConfig", "TrainConfig", "DecodeConfig", "DataConfig",
    "SplitConfig",
]
