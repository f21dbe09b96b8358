"""Serving layer tests: engine batching + HTTP round trip (tiny model)."""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from macaw_llm_tpu.config import Config, MeshConfig, tiny_model_config
from macaw_llm_tpu.models import fusion
from macaw_llm_tpu.serve import InferenceEngine, Request, serve


class MiniTok:
    pad_token_id = 32006

    def encode(self, text):
        return [1] + [7 + (hash(w) % 31000) for w in text.split()]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)


@pytest.fixture(scope="module")
def setup():
    cfg = Config(model=tiny_model_config(), mesh=MeshConfig(1, 1, 1))
    params = fusion.init_params(jax.random.PRNGKey(0), cfg.model)
    return cfg, params


class TestEngine:
    def test_single_request(self, setup):
        cfg, params = setup
        eng = InferenceEngine(params, cfg, MiniTok(), max_batch=4,
                              batch_timeout_ms=10, max_new_tokens=4)
        eng.start()
        try:
            out = eng.generate_sync(Request(prompt="hello world"),
                                    timeout=600)
            assert "text" in out and out["tokens"] <= 4
            assert eng.stats["requests"] == 1
        finally:
            eng.stop()

    def test_requests_are_batched(self, setup):
        cfg, params = setup
        eng = InferenceEngine(params, cfg, MiniTok(), max_batch=4,
                              batch_timeout_ms=200, max_new_tokens=4)
        eng.start()
        try:
            results = [None] * 3

            def worker(i):
                results[i] = eng.generate_sync(
                    Request(prompt=f"question number {i}"), timeout=600)

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(3)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(600)
            assert all(r is not None and "text" in r for r in results)
            # all three should have ridden one batch
            assert eng.stats["batches"] <= 2
            assert max(r["batch_size"] for r in results) >= 2
        finally:
            eng.stop()

    def test_media_request(self, setup):
        cfg, params = setup
        size = cfg.model.vision.image_size
        eng = InferenceEngine(params, cfg, MiniTok(), max_batch=2,
                              batch_timeout_ms=10, max_new_tokens=4)
        eng.start()
        try:
            out = eng.generate_sync(Request(
                prompt="what is this",
                image=np.full((size, size, 3), 100, np.uint8),
                audio=np.zeros(480000, np.float32)), timeout=600)
            assert "text" in out
        finally:
            eng.stop()


class TestHTTP:
    def test_http_round_trip(self, setup):
        cfg, params = setup
        server = serve(params, cfg, MiniTok(), host="127.0.0.1", port=0,
                       max_batch=2, batch_timeout_ms=10, max_new_tokens=4)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
                health = json.loads(r.read())
            assert health["status"] == "ok"

            body = json.dumps({"prompt": "hi there",
                               "max_new_tokens": 4}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=600) as r:
                out = json.loads(r.read())
            assert "text" in out
        finally:
            server.shutdown()
            server.engine.stop()
