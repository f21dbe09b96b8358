"""Learnable-eval fixture (VERDICT r2 #8): eval_token_accuracy had only
ever been run on random tokens, where 0.0 is the expected value — a shift
or mask bug in the in-graph accuracy (trainer.py eval_step_fn) would be
invisible. Here the model trains on a DETERMINISTIC counting task
(t_{i+1} = t_i + 1 over a cyclic alphabet — a bigram function a tiny
model learns in a few dozen steps) and accuracy must rise well above
chance. An off-by-one in the shifted argmax would score ~0 instead:
the task's accuracy is position-sensitive by construction.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macaw_llm_tpu.config import (Config, IGNORE_ID, MeshConfig,
                                  TrainConfig, tiny_model_config)
from macaw_llm_tpu.models import fusion
from macaw_llm_tpu.parallel.mesh import create_mesh
from macaw_llm_tpu.train.trainer import Trainer

pytestmark = pytest.mark.medium  # 150 real train steps: minutes

BASE, K, S = 100, 32, 33  # alphabet [BASE, BASE+K), sequences of S tokens


def counting_batch(rng: np.random.RandomState, b: int, accum: int = 1):
    s0 = rng.randint(0, K, (accum, b, 1))
    seq = BASE + (s0 + np.arange(S)[None, None, :]) % K
    ids = seq.astype(np.int32)
    labels = ids.copy()
    labels[:, :, 0] = IGNORE_ID  # first position has no predictable prior
    return {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((accum, b, S), jnp.int32),
        "labels": jnp.asarray(labels),
    }


def test_token_accuracy_learns_counting():
    cfg = Config(
        model=tiny_model_config(),
        mesh=MeshConfig(1, 1, 1, 1),
        train=TrainConfig(learning_rate=3e-3, warmup_ratio=0.05,
                          per_device_batch_size=8, grad_accum_steps=1,
                          freeze_encoders=True, lr_schedule="constant"),
    )
    mesh = create_mesh(cfg.mesh, jax.devices()[:1])
    params = fusion.init_params(jax.random.PRNGKey(0), cfg.model)
    trainer = Trainer(cfg, mesh, total_steps=200)
    state = trainer.init_state(params)

    rng = np.random.RandomState(0)
    eval_batches = [jax.tree.map(lambda x: x[0], counting_batch(rng, 8))
                    for _ in range(2)]

    before = trainer.evaluate(state, eval_batches)
    for _ in range(150):
        state, m = trainer.train_step(state, counting_batch(rng, 8))
    after = trainer.evaluate(state, eval_batches)

    # untrained: chance is 1/K on the alphabet (~0.03 over the vocab)
    assert before["eval_token_accuracy"] < 0.2, before
    # trained: the bigram rule must be learned — and an off-by-one in the
    # shifted-argmax accuracy would read ~0 here, not ~1
    assert after["eval_token_accuracy"] > 0.5, (before, after)
    assert after["eval_loss"] < before["eval_loss"]


def test_accuracy_counts_only_valid_positions():
    """IGNORE_ID positions must not enter the denominator: a batch whose
    labels are ALL ignored except one position scores on that position
    alone."""
    cfg = Config(model=tiny_model_config(), mesh=MeshConfig(1, 1, 1, 1))
    mesh = create_mesh(cfg.mesh, jax.devices()[:1])
    params = fusion.init_params(jax.random.PRNGKey(0), cfg.model)
    trainer = Trainer(cfg, mesh, total_steps=10)
    state = trainer.init_state(params)

    rng = np.random.RandomState(1)
    batch = jax.tree.map(lambda x: x[0], counting_batch(rng, 4))
    labels = np.asarray(batch["labels"]).copy()
    labels[:, :-1] = IGNORE_ID           # only the last position counts
    batch["labels"] = jnp.asarray(labels)
    step = trainer.eval_step_fn()
    _, correct, total = step(state, batch)
    assert int(total) == 4               # one valid target per row
    assert 0 <= int(correct) <= 4
