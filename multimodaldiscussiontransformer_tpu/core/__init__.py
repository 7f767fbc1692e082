from multimodaldiscussiontransformer_tpu.core import registry
from multimodaldiscussiontransformer_tpu.core.config import (
    BertTowerConfig,
    DataConfig,
    ModelConfig,
    OptimConfig,
    TaskConfig,
    TrainConfig,
    ViTTowerConfig,
)

__all__ = [
    "registry",
    "ModelConfig",
    "TaskConfig",
    "OptimConfig",
    "DataConfig",
    "TrainConfig",
    "BertTowerConfig",
    "ViTTowerConfig",
]
