"""GSPMD sharding rules — the TPU-native replacement for the reference's
entire distributed stack (DeepSpeed ZeRO-3 + Ulysses SP, SURVEY.md §2.5):

- parameters: every weight shards its largest divisible axis over ALL mesh
  axes (ZeRO-3 / FSDP equivalent of scripts/zero3.json) — XLA inserts the
  all-gathers before use and reduce-scatters on gradients;
- batch axis of activations -> "data";
- the huge modality-token axes (image/audio streams and their KV caches)
  -> "seq" — sequence parallelism over ICI, the Ulysses analog
  (reference: sequence_parallel/ulysses_attn.py:165-207);
- attention heads / FFN intermediate -> "model" (tensor parallel — absent in
  the reference, free here).

No hand-rolled collectives: `constrain` only annotates; GSPMD places
all-to-alls / all-gathers on ICI.
"""
from __future__ import annotations

import threading
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vidi_tpu.core.mesh import AXES

_ctx = threading.local()


def set_mesh(mesh: Optional[Mesh]):
    _ctx.mesh = mesh


def get_mesh() -> Optional[Mesh]:
    return getattr(_ctx, "mesh", None)


class use_mesh:
    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __enter__(self):
        self.prev = get_mesh()
        set_mesh(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        set_mesh(self.prev)


def constrain(x, *spec):
    """with_sharding_constraint if a mesh is active, else identity."""
    mesh = get_mesh()
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


# ---------------------------------------------------------------------------
# Parameter (FSDP) shardings
# ---------------------------------------------------------------------------

def fsdp_param_spec(shape, mesh: Mesh, min_size: int = 2**14) -> P:
    """Shard the largest axis divisible by the full mesh size; small tensors
    stay replicated (gather traffic would exceed the memory win)."""
    n = int(np.prod(mesh.devices.shape))
    if n == 1 or int(np.prod(shape)) < min_size:
        return P()
    # prefer the largest divisible axis (ties -> later axis for matmul layouts)
    best, best_dim = -1, None
    for i, s in enumerate(shape):
        if s % n == 0 and s >= best:
            best, best_dim = s, i
    if best_dim is None:
        return P()
    spec = [None] * len(shape)
    spec[best_dim] = AXES  # shard over ("data", "seq", "model") jointly
    return P(*spec)


def param_shardings(params, mesh: Mesh):
    return jax.tree.map(
        lambda a: NamedSharding(mesh, fsdp_param_spec(a.shape, mesh)), params)


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, s), tree)


def shard_params(params, mesh: Mesh):
    return jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, fsdp_param_spec(a.shape, mesh))),
        params,
    )
