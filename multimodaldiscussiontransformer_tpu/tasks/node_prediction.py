"""Node-prediction (hate-speech classification) task.

Reference: ``NodePredictionTask`` (mDT/src/tasks/node_prediction.py:22-55).
Its ``build_model`` re-assigns a fresh ``nn.Linear(768, 2)`` classifier when
fine-tuning from a contrastive checkpoint — but assigns it to the wrapper
module instead of the encoder that actually runs it, so the reset never takes
effect (SURVEY.md §2.1 quirk). This rebuild implements the *intent*: the
checkpoint-transform layer (utils/checkpoints.py
``reset_classifier_head``) re-initializes the live classifier params on task
transfer, and this task applies it when restoring a contrastive checkpoint.
"""

from __future__ import annotations

from typing import Any, Optional

import jax

from multimodaldiscussiontransformer_tpu.core.config import TrainConfig
from multimodaldiscussiontransformer_tpu.core.registry import register_task
from multimodaldiscussiontransformer_tpu.tasks.task import Task


@register_task("node_prediction")
class NodePredictionTask(Task):
    contrastive = False

    def __init__(self, cfg: TrainConfig):
        if cfg.criterion != "node_cross_entropy":
            cfg = cfg.replace(criterion="node_cross_entropy")
        super().__init__(cfg)

    def transfer_from_contrastive(self, params: Any, seed: int = 0) -> Any:
        """Head reset on contrastive -> node-prediction transfer
        (intent of node_prediction.py:44-54)."""
        from multimodaldiscussiontransformer_tpu.utils.checkpoints import (
            reset_classifier_head,
        )

        return reset_classifier_head(params, jax.random.PRNGKey(seed))
