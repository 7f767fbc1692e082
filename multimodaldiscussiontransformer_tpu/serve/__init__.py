"""Serving: incremental (re-scoring) inference over growing discussions."""

from multimodaldiscussiontransformer_tpu.serve.incremental import (  # noqa: F401
    DiscussionScorer,
)
