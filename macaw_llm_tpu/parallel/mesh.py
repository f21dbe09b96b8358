"""Device mesh construction.

The reference's distribution is torchrun DP + DeepSpeed ZeRO-2/3 over NCCL
(train.sh:14,16; configs/deepspeed_config*.json). The TPU-native equivalent
is one ``jax.sharding.Mesh`` with axes (data, fsdp, tensor): DP = data,
ZeRO-3 param/optimizer sharding = fsdp, and a tensor axis so TP is a config
change (SURVEY §2.8). GSPMD emits all collectives from sharding
annotations; nothing in user code ever calls a collective directly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from macaw_llm_tpu.config import MeshConfig

DCN_AXIS = "dcn"
DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"
AXES = (DCN_AXIS, DATA_AXIS, FSDP_AXIS, TENSOR_AXIS)
BATCH_AXES = (DCN_AXIS, DATA_AXIS, FSDP_AXIS)


def create_mesh(cfg: MeshConfig = MeshConfig(),
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh over (dcn, data, fsdp, tensor).

    Devices are ordered by process so the leading `dcn` axis cuts on
    process/slice boundaries: within-slice axes (data/fsdp/tensor) then
    only ever communicate over ICI, and dcn collectives (the gradient
    all-reduce) ride DCN — the layout the scaling playbook prescribes."""
    if devices is None:
        devices = jax.devices()
    c, d, f, t = cfg.resolved(len(devices))
    devices = sorted(devices, key=lambda dev: (dev.process_index, dev.id))
    if c > 1 and jax.process_count() > 1:
        per = len(devices) // jax.process_count()
        assert (len(devices) // c) % per == 0, (
            f"dcn={c} does not cut on process boundaries "
            f"({jax.process_count()} processes x {per} devices)")
    arr = np.asarray(devices).reshape(c, d, f, t)
    return Mesh(arr, AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Global batch sharded over (dcn, data, fsdp) — the DP+ZeRO layout."""
    return NamedSharding(mesh, P(BATCH_AXES))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def multihost_initialize() -> None:
    """Multi-host/multi-slice init (torchrun rendezvous equivalent,
    train.sh:7-9). Safe no-op in single-process runs.

    On Cloud TPU pods ``jax.distributed.initialize()`` autodetects
    everything; elsewhere (GKE, the multi-process CPU test) the
    coordinator/process topology comes from env:
      COORDINATOR_ADDRESS host:port, NUM_PROCESSES, PROCESS_ID
    """
    import os
    addr = os.environ.get("COORDINATOR_ADDRESS")
    if not addr:
        return
    nproc = os.environ.get("NUM_PROCESSES")
    pid = os.environ.get("PROCESS_ID")
    if nproc is not None and pid is not None:
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=int(nproc),
                                   process_id=int(pid))
    else:
        jax.distributed.initialize()
