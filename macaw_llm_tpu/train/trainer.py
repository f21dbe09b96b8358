"""pjit training loop: FSDP-sharded fused-model fine-tuning.

Replaces the reference's HF Trainer + DeepSpeed ZeRO stack
(llm_trainer.py:183-417, train.sh, configs/deepspeed_config*.json) with a
single jitted train step over a (data, fsdp, tensor) mesh:

  * optimizer: AdamW β=(0.9, 0.999), lr 3e-5, cosine schedule with 3%
    warmup, wd 0, grad-clip 1.0 (reference deepspeed_config.json:2-13,
    train.sh:27-30, TrainingArguments defaults)
  * grad accumulation via lax.scan over a leading microbatch axis
    (reference --gradient_accumulation_steps 3, train.sh:22)
  * bf16 compute / fp32 master params (the TPU answer to fp16 + dynamic
    loss scaling, deepspeed_config.json:14-21 — no loss scaling needed)
  * encoder freezing that actually works (SURVEY quirk #1): frozen params
    are a separate non-differentiated pytree
  * GSPMD shards params per sharding.PARTITION_RULES; optimizer state
    inherits shardings by propagation (ZeRO-3 equivalence)
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from macaw_llm_tpu.config import Config, ModelConfig, TrainConfig
from macaw_llm_tpu.models import fusion

from macaw_llm_tpu.parallel.sharding import (infer_shardings,
                                              opt_state_shardings)
from macaw_llm_tpu.train.state import (TrainState, merge_params,
                                       split_params)

logger = logging.getLogger(__name__)


def make_lr_schedule(cfg: TrainConfig, total_steps: int):
    warmup = max(1, int(cfg.warmup_ratio * total_steps))
    # inference-only Trainers pass total_steps=1; keep the cosine segment
    # nonempty so optax does not reject decay_steps == warmup_steps
    total_steps = max(total_steps, warmup + 1)
    if cfg.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.learning_rate,
            warmup_steps=warmup, decay_steps=total_steps, end_value=0.0)
    if cfg.lr_schedule == "linear":
        return optax.join_schedules([
            optax.linear_schedule(0.0, cfg.learning_rate, warmup),
            optax.linear_schedule(cfg.learning_rate, 0.0,
                                  total_steps - warmup),
        ], [warmup])
    if cfg.lr_schedule == "constant":
        return optax.join_schedules([
            optax.linear_schedule(0.0, cfg.learning_rate, warmup),
            optax.constant_schedule(cfg.learning_rate),
        ], [warmup])
    raise ValueError(cfg.lr_schedule)


def make_optimizer(cfg: TrainConfig, total_steps: int
                   ) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(make_lr_schedule(cfg, total_steps),
                    b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
                    weight_decay=cfg.weight_decay,
                    mu_dtype=jnp.dtype(cfg.mu_dtype)),
    )


def create_train_state(params: dict, cfg: Config, total_steps: int,
                       rng: Optional[jax.Array] = None) -> TrainState:
    trainable, frozen = split_params(params, cfg.train.freeze_encoders)
    tx = make_optimizer(cfg.train, total_steps)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        frozen=frozen,
        opt_state=tx.init(trainable),
        rng=rng if rng is not None else jax.random.PRNGKey(cfg.train.seed),
    )


def _loss_fn(trainable: dict, frozen: dict, mcfg: ModelConfig,
             batch: Dict[str, jnp.ndarray], dropout_rng,
             lora_scale: float = 1.0, ring_mesh=None,
             align_cache=None) -> jnp.ndarray:
    params = merge_params(trainable, frozen)
    loss, _ = fusion.forward(
        params, mcfg,
        input_ids=batch["input_ids"],
        images=batch.get("images"),
        audios=batch.get("audios"),
        videos=batch.get("videos"),
        attention_mask=batch.get("attention_mask"),
        labels=batch["labels"],
        dropout_rng=dropout_rng,
        lora_scale=lora_scale,
        ring_mesh=ring_mesh,
        align_cache=align_cache)
    return loss


def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
               mcfg: ModelConfig, tx: optax.GradientTransformation,
               lr_schedule, lora_scale: float = 1.0,
               grad_dtype=jnp.float32, ring_mesh=None,
               align_cache=None
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimizer step over a batch with a leading grad-accum axis
    [A, B, ...] (A=1 for no accumulation).

    grad_dtype=bfloat16 differentiates w.r.t. the bf16-cast params (the
    compute dtype the forward casts to anyway), halving the grad tree —
    what makes the 1b full fine-tune fit one v5e. Masters stay fp32.
    """
    rng, step_rng = jax.random.split(state.rng)
    accum = jax.tree_util.tree_leaves(batch)[0].shape[0]

    gd = jnp.dtype(grad_dtype)
    diff_params = state.trainable
    if gd != jnp.float32:
        diff_params = jax.tree.map(lambda x: x.astype(gd), state.trainable)

    grad_fn = jax.value_and_grad(
        partial(_loss_fn, ring_mesh=ring_mesh, align_cache=align_cache))
    micro_rngs = jax.random.split(step_rng, accum)

    if accum == 1:
        # no accumulation: skip the scan so no second full-size grad tree
        # is carried — XLA frees each grad leaf into its optimizer update
        # (the scan carry alone is +4.8 GB at the 1b full-FT profile)
        mb = jax.tree.map(lambda x: x[0], batch)
        loss, grads = grad_fn(diff_params, state.frozen, mcfg, mb,
                              micro_rngs[0], lora_scale)
    else:
        def micro(carry, xs):
            loss_sum, grad_sum = carry
            mb, mrng = xs
            loss, grads = grad_fn(diff_params, state.frozen, mcfg, mb,
                                  mrng, lora_scale)
            return (loss_sum + loss,
                    jax.tree.map(jnp.add, grad_sum, grads)), None

        zero_grads = jax.tree.map(
            lambda x: jnp.zeros(x.shape, gd), state.trainable)
        (loss_sum, grad_sum), _ = jax.lax.scan(
            micro, (jnp.zeros(()), zero_grads), (batch, micro_rngs))
        loss = loss_sum / accum
        grads = jax.tree.map(lambda g: (g / accum).astype(gd), grad_sum)

    updates, new_opt = tx.update(grads, state.opt_state, state.trainable)
    new_trainable = optax.apply_updates(state.trainable, updates)

    metrics = {
        "loss": loss,
        "grad_norm": optax.global_norm(grads),
        "lr": lr_schedule(state.step),
    }
    return TrainState(step=state.step + 1, trainable=new_trainable,
                      frozen=state.frozen, opt_state=new_opt,
                      rng=rng), metrics


class Trainer:
    """Binds config + mesh into jitted, sharded train/eval steps."""

    def __init__(self, cfg: Config, mesh: Mesh, total_steps: int):
        self.cfg = cfg
        self.mesh = mesh
        self.total_steps = total_steps
        self.tx = make_optimizer(cfg.train, total_steps)
        self.lr_schedule = make_lr_schedule(cfg.train, total_steps)
        self._step = None
        self._state_shardings = None
        self._opt_dev_shardings = None
        self._opt_host_shardings = None
        self._align_cache = None

    # -------------------- state --------------------

    def init_state(self, params: dict,
                   rng: Optional[jax.Array] = None,
                   donate: bool = False) -> TrainState:
        """Create the train state ON the mesh: params are placed per the
        partition rules; optimizer state inherits via GSPMD propagation.

        donate=True aliases the caller's param buffers into the state
        instead of copying (the caller must not touch ``params`` after).
        Single-chip 7b fine-tunes need this: the copy ping-pong
        fragments HBM and the train step then cannot place its multi-GB
        contiguous temp slab."""
        if self.cfg.train.quantize_base:
            assert self.cfg.train.lora_rank > 0, \
                "quantize_base requires LoRA (the base must be frozen)"
            if not isinstance(params["llm"]["layers"]["attn"].get("wq"),
                              dict):  # caller may pre-quantize in one jit
                from macaw_llm_tpu.utils.quantize import quantize_llama
                params = dict(params)
                params["llm"] = quantize_llama(params["llm"], donate=donate)
        trainable, frozen = split_params(
            params, self.cfg.train.freeze_encoders,
            lora=self.cfg.train.lora_rank > 0)
        fd = self.cfg.train.frozen_dtype
        if frozen and fd != "param":
            frozen = _cast_frozen(frozen, jnp.dtype(fd))
        if (self.cfg.train.pack_frozen_towers
                and self.cfg.train.freeze_encoders):
            # frozen towers are inference-shaped: pack each CLIP/Whisper
            # attention layer's q/k/v into one [h, 3h] in-proj stream
            # (exact math, split after the dot) — the training-side
            # counterpart of fusion.pack_towers. No gradients flow here
            # (the subtree is frozen), so the inference-only layout is
            # safe.
            from macaw_llm_tpu.ops.attention import pack_mha
            frozen = dict(frozen)
            for tower in ("image_encoder", "video_encoder",
                          "audio_encoder"):
                if tower in frozen and "attn" in frozen[tower].get(
                        "layers", {}):
                    t = dict(frozen[tower])
                    layers = dict(t["layers"])
                    layers["attn"] = pack_mha(layers["attn"])
                    t["layers"] = layers
                    frozen[tower] = t
        t_shard = infer_shardings(trainable, self.mesh)
        f_shard = infer_shardings(frozen, self.mesh)
        # jitted identity instead of device_put: device_put may alias the
        # caller's buffers, and train_step donates the state — every
        # init_state must own fresh storage (unless donate=True, where
        # ownership transfers and no copy happens at all).
        # Donation is single-device-only: on a multi-device mesh the
        # caller's unsharded buffers can never alias the sharded outputs
        # (XLA flags them "not usable"), and with aval collisions the
        # alias pairing itself breaks (seen on the 8-device CPU mesh:
        # "Expected aliased input ... to have the same size"). The
        # fragmentation problem donation solves is single-chip anyway.
        kw = (dict(donate_argnums=(0,))
              if donate and self.mesh.size == 1 else {})
        trainable = jax.jit(lambda t: t, out_shardings=t_shard,
                            **kw)(trainable)
        frozen = (jax.jit(lambda t: t, out_shardings=f_shard,
                          **kw)(frozen)
                  if frozen else frozen)

        abstract = jax.eval_shape(self.tx.init, trainable)
        opt_shard = opt_state_shardings(abstract, t_shard, self.mesh)
        opt_state = jax.jit(self.tx.init,
                            out_shardings=opt_shard)(trainable)
        if self.cfg.train.offload_optimizer:
            # ZeRO-Offload equivalent (the reference's shipped default,
            # configs/deepspeed_config.json:25-37): mu/nu live in host
            # DRAM between steps and stream through HBM inside the step.
            # Same PartitionSpecs — only the memory space changes.
            # Transfer structure (the ONE pattern that works on both the
            # TPU runtime and the simulated CPU mesh — jitting with
            # pinned_host OUT shardings trips the SPMD partitioner's
            # "Side-effect HLO must have sharding" RET_CHECK, and an
            # in-jit device_put PUSH to host is silently dropped on the
            # CPU backend):
            #   * h2d pull: in-jit device_put at the top of step_fn —
            #     overlaps with early compute under the latency-hiding
            #     scheduler
            #   * step outputs: device memory (plain shardings)
            #   * d2h push: outside-jit device_put in train_step
            # Scalars (adam count) stay on device: 4 bytes saves nothing
            # and the s32[] annotate_device_placement is exactly what
            # the RET_CHECK fires on.
            self._opt_dev_shardings = opt_shard
            self._opt_host_shardings = jax.tree.map(
                lambda leaf, s: (s.with_memory_kind("pinned_host")
                                 if leaf.ndim >= 1 else s),
                abstract, opt_shard)
            opt_state = jax.device_put(opt_state, self._opt_host_shardings)
        rep = NamedSharding(self.mesh, P())
        state = TrainState(
            step=jax.device_put(jnp.zeros((), jnp.int32), rep),
            trainable=trainable, frozen=frozen, opt_state=opt_state,
            rng=jax.device_put(
                rng if rng is not None
                else jax.random.PRNGKey(self.cfg.train.seed), rep))
        self._state_shardings = jax.tree.map(
            lambda x: x.sharding if hasattr(x, "sharding") else None, state)

        if (self.cfg.train.lora_rank > 0
                and self.cfg.train.align_cache != "off"):
            # LoRA + align_cache: the alignment K/V projections of the
            # vocab memory are precomputed ONCE and treated as constants —
            # this EFFECTIVELY FREEZES the align in-proj K/V rows and
            # bias_k/bias_v (they get zero gradients and never move, so
            # the cache never goes stale; the Q rows and out-proj still
            # train through the query path). embed_tokens is frozen under
            # LoRA anyway. Set align_cache="off" to train the full
            # alignment attention at ~1.75 GB of extra temps and
            # 6.4 TFLOP/step at 7b. Contract asserted by
            # tests/test_align_cache.py::test_cache_freezes_align_kv.
            mcfg = self.cfg.model
            quant = self.cfg.train.align_cache == "int8"
            full = merge_params(trainable, frozen)
            self._align_cache = jax.jit(
                lambda p: fusion.precompute_align_cache(p, mcfg,
                                                        quantize=quant)
            )(full)
            jax.block_until_ready(self._align_cache)
            logger.info(
                "align_cache=%s: alignment K/V projections precomputed and "
                "frozen (Q/out-proj still train); align_cache='off' trains "
                "them", self.cfg.train.align_cache)
        return state

    # -------------------- steps --------------------

    def step_fn(self):
        if self._step is None:
            mcfg = self.cfg.model
            tx, sched = self.tx, self.lr_schedule

            lora_scale = (self.cfg.train.lora_alpha
                          / max(self.cfg.train.lora_rank, 1))

            grad_dtype = jnp.dtype(self.cfg.train.grad_dtype)
            ring_mesh = self.mesh if mcfg.ring_attention else None

            # pin the output state's shardings to the input state's:
            # donation aliases buffers by aval, and without the pin GSPMD
            # may lay an output leaf out differently (e.g. replicate a
            # small stacked norm it chose to shard on input), which
            # fails the aliasing check at runtime
            out_sh = ((self._state_shardings, None)
                      if self._state_shardings is not None else None)
            opt_dev = self._opt_dev_shardings
            if opt_dev is not None:
                # offload: NO out_shardings at all — with a pinned_host
                # input in the program, jit+out_shardings annotates every
                # output with a device placement and the replicated
                # scalar outputs (step, adam count) then fail the SPMD
                # partitioner's side-effect sharding RET_CHECK (measured:
                # any out_shardings + host input + scalar out crashes;
                # the same program without out_shardings compiles). The
                # layout pin moves in-graph (with_sharding_constraint on
                # the output state below), which emits plain Sharding
                # custom-calls the partitioner accepts. The new opt state
                # comes back in device memory; train_step pushes it to
                # host outside the jit.
                out_sh = None
                pin_sh = (self._state_shardings._replace(opt_state=opt_dev)
                          if self._state_shardings is not None else None)
                pin_sh = jax.tree.map(
                    lambda s: NamedSharding(s.mesh, s.spec), pin_sh)

            @partial(jax.jit, donate_argnums=(0,), out_shardings=out_sh)
            def _step(state, batch, align_cache):
                batch = jax.lax.with_sharding_constraint(
                    batch, batch_sharding_tree(batch, self.mesh))
                if opt_dev is not None:
                    # offload_optimizer h2d pull: mu/nu from host DRAM
                    # into HBM for the update — in-graph, overlaps with
                    # early compute under XLA's latency-hiding
                    # scheduler. Scalars (adam count) never offloaded —
                    # see init_state — and must not get an in-jit
                    # device_put either (the SPMD partitioner rejects
                    # the unsharded s32[] annotate_device_placement).
                    state = state._replace(opt_state=jax.tree.map(
                        lambda x, s: (jax.device_put(x, s)
                                      if x.ndim >= 1 else x),
                        state.opt_state, opt_dev))
                out = train_step(state, batch, mcfg, tx, sched, lora_scale,
                                 grad_dtype=grad_dtype,
                                 ring_mesh=ring_mesh,
                                 align_cache=align_cache)
                if opt_dev is not None and pin_sh is not None:
                    out = (jax.lax.with_sharding_constraint(out[0], pin_sh),
                           out[1])
                return out

            self._step = _step
        return self._step

    def train_step(self, state: TrainState, batch: Dict[str, Any]):
        if self.cfg.model.ring_attention and "attention_mask" in batch:
            # ring attention has no padding-bias support (long-context
            # training packs sequences); a padded batch would silently
            # attend to padding keys — fail loudly instead. Host-side
            # check on the tiny [A, B, S] int mask.
            import numpy as np
            if not np.asarray(batch["attention_mask"]).all():
                raise ValueError(
                    "ring_attention requires an all-ones attention_mask "
                    "(pack sequences instead of padding)")
        new_state, metrics = self.step_fn()(state, batch,
                                            self._align_cache)
        if self._opt_host_shardings is not None:
            # offload d2h push: the step emitted the new opt state in
            # device memory (see step_fn); move it back to host DRAM.
            # device_put dispatches async — it overlaps with the caller's
            # host work (data loading, metrics) — and the HBM copies free
            # as the transfer drains, restoring the between-step HBM
            # budget the offload exists for.
            new_state = new_state._replace(opt_state=jax.device_put(
                new_state.opt_state, self._opt_host_shardings))
        return new_state, metrics

    def eval_step_fn(self):
        """Forward-only eval: (loss, correct-token count, valid-token
        count) on a [B, ...] batch — the reference's token-accuracy metric
        (run_clm_llms.py:515-528) computed in-graph so the [B, S, V]
        logits never leave the device."""
        if getattr(self, "_eval", None) is None:
            import dataclasses
            # eval needs the full logits for token accuracy — the chunked
            # CE path (loss_chunk > 0) returns logits=None by design
            mcfg = dataclasses.replace(self.cfg.model, loss_chunk=0)
            lora_scale = (self.cfg.train.lora_alpha
                          / max(self.cfg.train.lora_rank, 1))

            @jax.jit
            def _eval(state, batch):
                bs = NamedSharding(self.mesh, P(("dcn", "data", "fsdp")))
                batch = jax.lax.with_sharding_constraint(
                    batch, jax.tree.map(lambda x: bs, batch))
                params = merge_params(state.trainable, state.frozen)
                loss, logits = fusion.forward(
                    params, mcfg,
                    input_ids=batch["input_ids"],
                    images=batch.get("images"),
                    audios=batch.get("audios"),
                    videos=batch.get("videos"),
                    attention_mask=batch.get("attention_mask"),
                    labels=batch["labels"],
                    lora_scale=lora_scale)
                # labels get prefix_len IGNOREs prepended inside forward
                # (absent modalities shrink the prefix — derive it from
                # the logits); rebuild the extended view for shifted
                # argmax accuracy
                from macaw_llm_tpu.config import IGNORE_ID
                lab = batch["labels"]
                prefix = logits.shape[1] - lab.shape[1]
                ext = jnp.concatenate(
                    [jnp.full((lab.shape[0], prefix),
                              IGNORE_ID, lab.dtype), lab], axis=1)
                preds = jnp.argmax(logits[:, :-1], axis=-1)
                refs = ext[:, 1:]
                valid = refs != IGNORE_ID
                correct = jnp.sum(jnp.where(valid, preds == refs, False))
                return loss, correct, valid.sum()

            self._eval = _eval
        return self._eval

    def evaluate(self, state: TrainState, batches) -> Dict[str, float]:
        """Average eval loss / token accuracy over an iterable of [B, ...]
        batches (exact token-weighted accuracy via count aggregation)."""
        step = self.eval_step_fn()
        losses, correct, total = [], 0, 0
        for batch in batches:
            loss, c, n = step(state, batch)
            losses.append(float(loss))
            correct += int(c)
            total += int(n)
        return {
            "eval_loss": float(sum(losses) / max(len(losses), 1)),
            "eval_token_accuracy": correct / max(total, 1),
        }


def _cast_frozen(tree, dt):
    """Cast frozen floating leaves to the storage dtype, EXCEPT the fp32
    per-channel scales of int8 {'q','s'} records — quantize_tensor's
    contract is fp32 scales, and casting them to bf16 would stack ~0.2-0.4%
    rounding error on top of the int8 quantization error."""
    def rec(node):
        if isinstance(node, dict):
            if set(node.keys()) == {"q", "s"}:
                return node
            return {k: rec(v) for k, v in node.items()}
        if hasattr(node, "dtype") and jnp.issubdtype(node.dtype,
                                                     jnp.floating):
            return node.astype(dt)
        return node
    return rec(tree)


def batch_sharding_tree(batch: Dict[str, Any], mesh: Mesh):
    """Shard every batch leaf on its *batch* dimension. Batches carry a
    leading grad-accum axis [A, B, ...]: A stays replicated, B shards over
    (dcn, data, fsdp)."""
    bs = NamedSharding(mesh, P(None, ("dcn", "data", "fsdp")))
    return jax.tree.map(lambda x: bs, batch)
