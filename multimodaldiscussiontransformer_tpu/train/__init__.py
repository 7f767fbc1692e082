"""Training runtime: the TPU-native replacement for the FairSeq trainer
surface the reference consumes (SURVEY.md §2.3) — optimizer/schedule,
jit-compiled train/eval steps over a device mesh, gradient accumulation,
metric aggregation, Orbax checkpointing and the epoch loop."""

from multimodaldiscussiontransformer_tpu.train.optimizer import (  # noqa: F401
    make_optimizer,
    polynomial_decay_schedule,
    trainable_mask,
)
from multimodaldiscussiontransformer_tpu.train.trainer import (  # noqa: F401
    Trainer,
    TrainState,
)
