"""Task base: dataset resolution through the registry + trainer wiring.

Re-provides the surface of the reference ``Task``
(mDT/src/tasks/task.py:121-204): resolving the registered dataset factory by
``dataset_name``, wrapping its splits, and exposing batch iterators. The
FairSeq ``--user-data-dir`` module-walking import (task.py:146-161) becomes
an explicit ``user_module`` import hook.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import sys

from multimodaldiscussiontransformer_tpu.core.config import TrainConfig
from multimodaldiscussiontransformer_tpu.core.registry import DATASETS
from multimodaldiscussiontransformer_tpu.data.dataset import DiscussionDataset


def import_user_datasets(user_data_dir: str) -> None:
    """Import every module in ``user_data_dir`` so its ``@register_dataset``
    decorators fire — the explicit equivalent of
    ``Task.__import_user_defined_datasets`` (task.py:146-161)."""
    if not user_data_dir or not os.path.isdir(user_data_dir):
        return
    for fname in sorted(os.listdir(user_data_dir)):
        if not fname.endswith(".py") or fname.startswith("_"):
            continue
        mod_name = os.path.splitext(fname)[0]
        spec = importlib.util.spec_from_file_location(
            f"mdt_user_datasets.{mod_name}", os.path.join(user_data_dir, fname)
        )
        module = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = module
        spec.loader.exec_module(module)


class Task:
    """Binds a TrainConfig to a registered dataset and a Trainer."""

    contrastive = False

    def __init__(self, cfg: TrainConfig):
        self.cfg = cfg
        if cfg.task_cfg.user_data_dir:
            import_user_datasets(cfg.task_cfg.user_data_dir)

    def load_dataset(self, **factory_kwargs) -> DiscussionDataset:
        """Resolve the dataset factory by registered name and build splits
        (reference flow: register_dataset factory -> GraphormerPYGDataset,
        task.py:121-144)."""
        factory = DATASETS.get(self.cfg.task_cfg.dataset_name)
        spec = factory(**factory_kwargs)
        if isinstance(spec, DiscussionDataset):
            return spec
        # reference factories return {dataset, train_idx, valid_idx,
        # test_idx, source} (experiments/.../datasets/dataset.py:7-28)
        return DiscussionDataset.from_splits(
            spec["dataset"],
            train_idx=spec.get("train_idx"),
            valid_idx=spec.get("valid_idx"),
            test_idx=spec.get("test_idx"),
            seed=self.cfg.task_cfg.seed,
        )

    def build_trainer(self, **kw) -> "Trainer":
        from multimodaldiscussiontransformer_tpu.train.trainer import Trainer

        return Trainer(self.cfg, **kw)
