"""Dynamic-batching scorer + HTTP serving endpoint tests
(serve/server.py). The batching layer must coalesce concurrent requests
into shared device batches without changing any result."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np

from multimodaldiscussiontransformer_tpu.serve.incremental import Discussion
from multimodaldiscussiontransformer_tpu.serve.server import (
    BatchingScorer,
    ScoreServer,
)

from tests.test_serve import make_scorer


def _discussion(seed: int, n: int = 3) -> Discussion:
    rng = np.random.default_rng(seed)
    d = Discussion()
    d.add_node(-1, rng.integers(1, 120, 12).astype(np.int32))
    for i in range(1, n):
        d.add_node(int(rng.integers(0, i)), rng.integers(1, 120, 12).astype(np.int32))
    return d


def test_batching_scorer_matches_direct():
    scorer = make_scorer()
    batching = BatchingScorer(scorer, max_batch=8, max_wait_ms=20.0)
    try:
        discussions = [_discussion(s, n=2 + s % 3) for s in range(5)]
        direct = [scorer.score(d) for d in discussions]

        results = [None] * len(discussions)

        def worker(i):
            results[i] = batching.score(discussions[i])

        threads = [
            threading.Thread(target=worker, args=(i,))
            for i in range(len(discussions))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for got, want in zip(results, direct):
            assert got is not None
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    finally:
        batching.close()


def test_batching_scorer_propagates_errors():
    scorer = make_scorer()
    batching = BatchingScorer(scorer, max_batch=4, max_wait_ms=1.0)
    try:
        class Boom:
            num_nodes = 1

        raised = False
        try:
            batching.score_items([Boom()])
        except Exception:
            raised = True
        assert raised
        # the worker must survive a failed group and keep serving
        d = _discussion(0)
        assert batching.score(d).shape == (d.num_nodes, 2)
    finally:
        batching.close()


def _post(url, payload, timeout=120):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def test_http_score_endpoint():
    scorer = make_scorer()
    server = ScoreServer(("127.0.0.1", 0), scorer, max_wait_ms=5.0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as resp:
            assert json.loads(resp.read())["ok"]

        d = _discussion(7, n=4)
        payload = {
            "discussions": [
                {
                    "parents": d.parents,
                    "input_ids": [ids.tolist() for ids in d.input_ids],
                }
            ]
        }
        out = _post(f"http://127.0.0.1:{port}/v1/score", payload)
        probs = np.asarray(out["probs"][0])
        assert probs.shape == (4, 2)
        np.testing.assert_allclose(
            probs, scorer.score(d), rtol=2e-4, atol=2e-5
        )

        # malformed request -> 400 with an error message, server stays up
        try:
            _post(f"http://127.0.0.1:{port}/v1/score", {"discussions": []})
            raised = False
        except urllib.error.HTTPError as e:
            raised = True
            assert e.code == 400
            assert "error" in json.loads(e.read())
        assert raised
        out2 = _post(f"http://127.0.0.1:{port}/v1/score", payload)
        assert np.asarray(out2["probs"][0]).shape == (4, 2)
    finally:
        server.close()
        thread.join(timeout=10)
