"""Serving: incremental (re-scoring) inference over growing discussions,
plus the deployment layer (dynamic micro-batching + HTTP endpoint)."""

from multimodaldiscussiontransformer_tpu.serve.incremental import (  # noqa: F401
    DiscussionScorer,
)


def __getattr__(name):  # lazy: server.py pulls in http.server machinery
    if name in ("BatchingScorer", "ScoreServer"):
        from multimodaldiscussiontransformer_tpu.serve import server

        return getattr(server, name)
    raise AttributeError(name)
