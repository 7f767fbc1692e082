"""Tasks: node_prediction and contrastive_learning.

Registry names preserved from the reference
(mDT/src/tasks/node_prediction.py:22, contrastive.py:23)."""

from multimodaldiscussiontransformer_tpu.tasks.task import Task  # noqa: F401
from multimodaldiscussiontransformer_tpu.tasks.node_prediction import (  # noqa: F401
    NodePredictionTask,
)
from multimodaldiscussiontransformer_tpu.tasks.contrastive import (  # noqa: F401
    ContrastiveLearningTask,
)
