"""Device mesh and axis conventions.

TPU-native replacement for the reference's NCCL process groups
(reference: Vidi1.5_9B/vidi/model/lmm/dattn/sequence_parallel/globals.py:61-150):

- "data"  : data-parallel axis. Parameters are *also* sharded over
  ("data", "seq"), giving ZeRO-3 / FSDP semantics via GSPMD instead of the
  DeepSpeed engine (reference: scripts/zero3.json).
- "seq"   : sequence-parallel axis — the Ulysses equivalent. Cross-attention
  heads and encoder frame batches shard here
  (reference: sequence_parallel/ulysses_attn.py:165-207, split.py:72-93).
- "model" : optional tensor-parallel axis for the largest matmuls.

All collectives are inserted by XLA from sharding annotations; nothing here
hand-rolls a Slice/Gather.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SEQ_AXIS = "seq"
MODEL_AXIS = "model"
AXES = (DATA_AXIS, SEQ_AXIS, MODEL_AXIS)

# Parameters fully shard over every mesh axis (ZeRO-3 equivalent).
FSDP_AXES = (DATA_AXIS, SEQ_AXIS, MODEL_AXIS)


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    seq: int = 1,
    model: int = 1,
) -> Mesh:
    """Build a (data, seq, model) mesh. `data` defaults to whatever is left."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        assert n % (seq * model) == 0, (n, seq, model)
        data = n // (seq * model)
    assert data * seq * model == n, (data, seq, model, n)
    dev_array = np.asarray(devices).reshape(data, seq, model)
    return Mesh(dev_array, AXES)


def single_device_mesh() -> Mesh:
    return make_mesh([jax.devices()[0]], data=1, seq=1, model=1)


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
