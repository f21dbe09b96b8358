"""Eval harness unit tests: token accuracy metric and val-set loading."""

import json

import numpy as np

from macaw_llm_tpu.config import IGNORE_ID
from macaw_llm_tpu.eval import load_val_examples, token_accuracy


def test_token_accuracy_ignores_masked():
    # logits argmax == labels everywhere except one position; prompt masked
    V = 8
    labels = np.array([[IGNORE_ID, IGNORE_ID, 3, 4, 5]])
    logits = np.zeros((1, 5, V), np.float32)
    # shifted: preds[t] compares to labels[t+1]
    logits[0, 1, 3] = 9.0   # predicts labels[2]=3 -> correct
    logits[0, 2, 4] = 9.0   # correct
    logits[0, 3, 0] = 9.0   # wrong (labels[4]=5)
    acc = token_accuracy(logits, labels)
    assert abs(acc - 2.0 / 3.0) < 1e-6


def test_token_accuracy_all_masked():
    labels = np.full((1, 4), IGNORE_ID)
    logits = np.zeros((1, 4, 8), np.float32)
    assert token_accuracy(logits, labels) == 0.0


def test_load_val_examples_caps(tmp_path):
    rows = [{"instruction": f"q{i}", "response": "a"} for i in range(10)]
    p = tmp_path / "v.json"
    p.write_text(json.dumps(rows))
    out = load_val_examples(str(p), cap=4)
    assert len(out) == 4
    assert out[0]["instruction"] == "q0"
