"""Orbax sharded checkpointing with real resume.

The reference saves every 5000 steps, keeps 1, gathers ZeRO-3 16-bit
weights on save (train.sh:24-26, configs/deepspeed_config.json:40) and has
resume stubbed out (run_clm_llms.py:556-560). Here: async sharded Orbax
checkpoints of the full train state (params + optimizer + step + PRNG)
plus the config JSON, with first-class resume (SURVEY §5.4)."""

from __future__ import annotations

import json
import logging
import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from macaw_llm_tpu.config import Config
from macaw_llm_tpu.train.state import TrainState

logger = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, directory: str, save_steps: int = 5000,
                 max_to_keep: int = 1):
        self.directory = os.path.abspath(directory)
        self.save_steps = max(save_steps, 1)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_steps,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, state: TrainState, config: Optional[Config] = None,
             force: bool = False) -> bool:
        step = int(state.step)
        if step in self._mgr.all_steps():
            return False  # already checkpointed at this step
        if not force and step % self.save_steps != 0:
            # Orbax's CheckpointManager force-saves the first step it
            # sees regardless of save_interval_steps; gate here so a
            # step-1 multi-GB write cannot stall a fresh run
            return False
        saved = self._mgr.save(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardSave(state)),
            force=force)
        if saved:
            # the caller's next train_step DONATES the state buffers; the
            # async writer must finish reading them first or the d2h
            # stream deadlocks against the donated-buffer reuse (observed
            # over the axon tunnel: step-1 checkpoint wedged the run).
            # The disk write itself stays async inside Orbax; this only
            # fences the device reads.
            self._mgr.wait_until_finished()
        if saved and config is not None and jax.process_index() == 0:
            with open(os.path.join(self.directory, "config.json"), "w") as f:
                f.write(config.to_json())
        return saved

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, abstract_state: TrainState,
                step: Optional[int] = None) -> Optional[TrainState]:
        """Restore into the sharding/dtype layout of ``abstract_state``
        (pass a concrete state or jax.eval_shape result)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct,
                              abstract_state)
        restored = self._mgr.restore(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(target)))
        return restored["state"]

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def load_config(directory: str) -> Optional[Config]:
    path = os.path.join(directory, "config.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return Config.from_json(f.read())
