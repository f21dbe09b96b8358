"""Worker for the multi-process DP test (run by test_multiprocess.py).

Each of NUM_PROCESSES subprocesses owns 4 simulated CPU devices and joins
a jax.distributed job; together they form an 8-device global mesh with a
leading `dcn` (slice) axis — the multi-host/multi-slice layout of
SURVEY §2.8 (the reference's torchrun rendezvous, train.sh:7-9). Runs two
sharded train steps, saves an Orbax checkpoint (all processes write their
shards), restores it, and prints markers the parent asserts on.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
# Gloo (the CPU cross-process collective transport) must bind loopback:
# container hostnames don't resolve between the test subprocesses
os.environ.setdefault("GLOO_SOCKET_IFNAME", "lo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from macaw_llm_tpu.config import (Config, IGNORE_ID, MeshConfig,  # noqa: E402
                                  TrainConfig, tiny_model_config)
from macaw_llm_tpu.models import fusion  # noqa: E402
from macaw_llm_tpu.parallel.mesh import (create_mesh,  # noqa: E402
                                         multihost_initialize)
from macaw_llm_tpu.train.checkpoint import CheckpointManager  # noqa: E402
from macaw_llm_tpu.train.trainer import (Trainer,  # noqa: E402
                                         batch_sharding_tree)


def main():
    multihost_initialize()  # COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID
    assert jax.process_count() == int(os.environ["NUM_PROCESSES"])
    n = len(jax.devices())
    assert n == 4 * jax.process_count(), n

    cfg = Config(model=tiny_model_config(),
                 mesh=MeshConfig(dcn=jax.process_count(), data=1,
                                 fsdp=2, tensor=2),
                 train=TrainConfig(per_device_batch_size=1,
                                   grad_accum_steps=1))
    mesh = create_mesh(cfg.mesh)
    print(f"MESH {dict(mesh.shape)} proc={jax.process_index()}",
          flush=True)

    trainer = Trainer(cfg, mesh, total_steps=10)
    # identical init on every process (same seed) -> valid replicated tree
    params = jax.tree.map(np.asarray,
                          fusion.init_params(jax.random.PRNGKey(0),
                                             cfg.model))
    state = trainer.init_state(params)

    # global batch [A=1, B=8, ...]: every process materializes the full
    # host batch (same seed) and contributes its addressable shards
    rng = np.random.RandomState(7)
    batch_size, seq = n, 16
    ids = rng.randint(16, 32000, (1, batch_size, seq)).astype(np.int32)
    ids[:, :, 0] = 1
    labels = ids.copy()
    labels[:, :, :4] = IGNORE_ID
    vis = cfg.model.vision
    host = {
        "input_ids": ids,
        "attention_mask": np.ones((1, batch_size, seq), np.int32),
        "labels": labels,
        "images": np.zeros((1, batch_size, 3, vis.image_size,
                            vis.image_size), np.float32),
        "audios": np.zeros((1, batch_size, 80, 3000), np.float32),
        "videos": np.zeros((1, batch_size, cfg.model.fusion.n_frames, 3,
                            vis.image_size, vis.image_size), np.float32),
    }
    shardings = batch_sharding_tree(host, mesh)
    batch = jax.tree.map(
        lambda x, s: jax.make_array_from_callback(
            x.shape, s, lambda idx: x[idx]), host, shardings)

    state, m1 = trainer.train_step(state, batch)
    state, m2 = trainer.train_step(state, batch)
    l1, l2 = float(m1["loss"]), float(m2["loss"])
    assert np.isfinite(l1) and np.isfinite(l2)
    print(f"LOSS {l1:.6f} {l2:.6f}", flush=True)

    # sharded save/restore across processes
    ckpt_dir = os.environ["MACAW_MP_CKPT"]
    mgr = CheckpointManager(ckpt_dir, save_steps=1)
    mgr.save(state, cfg, force=True)
    mgr.wait()
    restored = mgr.restore(state)
    assert int(restored.step) == 2
    a = state.trainable["fusion"]["to_hidden"]["image"]["w"]
    b = restored.trainable["fusion"]["to_hidden"]["image"]["w"]
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(a.addressable_data(0))),
        np.asarray(jax.device_get(b.addressable_data(0))))
    # restored state trains on
    state3, m3 = trainer.train_step(restored, batch)
    assert np.isfinite(float(m3["loss"]))
    mgr.close()
    print("CKPT_OK", flush=True)


if __name__ == "__main__":
    main()
    sys.exit(0)
