"""Contrastive pre-training task over global discussion embeddings.

Reference: ``ContrastiveLearningTask`` (mDT/src/tasks/contrastive.py:23-48):
plain model build + ``ContrastiveBatchedDataDataset`` (adds ``hard_y``).
The collator emits per-graph ``y``/``hard_y`` when ``contrastive=True``.
"""

from __future__ import annotations

from multimodaldiscussiontransformer_tpu.core.config import TrainConfig
from multimodaldiscussiontransformer_tpu.core.registry import register_task
from multimodaldiscussiontransformer_tpu.tasks.task import Task


@register_task("contrastive_learning")
class ContrastiveLearningTask(Task):
    contrastive = True

    def __init__(self, cfg: TrainConfig):
        if cfg.criterion != "contrastive_loss":
            cfg = cfg.replace(criterion="contrastive_loss")
        if cfg.task != "contrastive_learning":
            cfg = cfg.replace(task="contrastive_learning")
        super().__init__(cfg)
