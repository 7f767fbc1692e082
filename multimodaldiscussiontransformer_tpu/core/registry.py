"""Named registries for models, architectures, tasks, criterions and datasets.

Re-provides the FairSeq registration surface the reference depends on
(reference: mDT/src/data/__init__.py:1-8 `DATASET_REGISTRY`/`register_dataset`;
fairseq `register_model` / `register_model_architecture` / `register_task` /
`register_criterion` used at
mDT/src/models/multi_modal_discussion_transformer.py:22,290,320,
mDT/src/tasks/node_prediction.py:22, mDT/src/tasks/contrastive.py:23,
mDT/src/criterions/hatespeech_loss.py:40, contrastive_loss.py:52).

Registered names are preserved verbatim so reference launch configs map 1:1:
models: ``multi_graphormer``; architectures: ``multi_graphormer``,
``multi_graphormer_base``; tasks: ``node_prediction``, ``contrastive_learning``;
criterions: ``node_cross_entropy``, ``contrastive_loss``; datasets:
``hateful_discussions``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator


class Registry:
    """A simple name -> object registry with a decorator interface."""

    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, Any] = {}

    def register(self, name: str) -> Callable[[Any], Any]:
        def decorator(obj: Any) -> Any:
            if name in self._entries:
                raise ValueError(
                    f"{self.kind} registry already has an entry named {name!r}"
                )
            self._entries[name] = obj
            return obj

        return decorator

    def get(self, name: str) -> Any:
        if name not in self._entries:
            raise KeyError(
                f"Unknown {self.kind} {name!r}. Available: "
                f"{sorted(self._entries)}"
            )
        return self._entries[name]

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def __iter__(self) -> Iterator[str]:
        return iter(self._entries)

    def names(self):
        return sorted(self._entries)


MODELS = Registry("model")
ARCHITECTURES = Registry("architecture")
TASKS = Registry("task")
CRITERIONS = Registry("criterion")
DATASETS = Registry("dataset")

register_model = MODELS.register
register_model_architecture = ARCHITECTURES.register
register_task = TASKS.register
register_criterion = CRITERIONS.register
register_dataset = DATASETS.register


def _import_all() -> None:
    """Import every module that carries ``@register_*`` decorators.

    Mirrors the reference's import-driven registration chain
    (mDT/src/__init__.py:2 -> criterions -> models; task registration via
    fairseq user-dir imports)."""
    import importlib

    for mod in (
        "multimodaldiscussiontransformer_tpu.models.mdt",
        "multimodaldiscussiontransformer_tpu.losses.node_cross_entropy",
        "multimodaldiscussiontransformer_tpu.losses.contrastive_loss",
        "multimodaldiscussiontransformer_tpu.tasks.node_prediction",
        "multimodaldiscussiontransformer_tpu.tasks.contrastive",
        "multimodaldiscussiontransformer_tpu.experiments.hateful_discussions.dataset",
        "multimodaldiscussiontransformer_tpu.data.synthetic",
    ):
        # importlib caches modules, so registration decorators fire at most
        # once; any exception here is a real bug and must propagate
        importlib.import_module(mod)


def populate() -> None:
    """Idempotently populate all registries (safe to call repeatedly)."""
    _import_all()
