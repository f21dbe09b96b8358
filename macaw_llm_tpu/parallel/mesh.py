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

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"
AXES = (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS)


def create_mesh(cfg: MeshConfig = MeshConfig(),
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    d, f, t = cfg.resolved(len(devices))
    arr = np.asarray(devices).reshape(d, f, t)
    return Mesh(arr, AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Global batch sharded over (data, fsdp) — the DP+ZeRO batch layout."""
    return NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def multihost_initialize() -> None:
    """Multi-host/multi-slice init (torchrun rendezvous equivalent,
    train.sh:7-9). Safe no-op in single-process runs."""
    import os
    if os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
