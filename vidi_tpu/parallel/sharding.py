"""GSPMD sharding rules — the TPU-native replacement for the reference's
entire distributed stack (DeepSpeed ZeRO-3 + Ulysses SP, SURVEY.md §2.5):

- parameters: text-decoder matmul weights carry Megatron-style TP specs
  (attention heads / FFN intermediate on "model", the other matmul dim
  ZeRO-3-sharded over ("data","seq")); every other weight shards its largest
  divisible axis over all mesh axes (ZeRO-3 / FSDP equivalent of
  scripts/zero3.json) — XLA inserts the all-gathers before use and
  reduce-scatters on gradients;
- batch axis of activations -> "data";
- the huge modality-token axes (image/audio streams and their KV caches)
  -> "seq" — sequence parallelism over ICI, the Ulysses analog
  (reference: sequence_parallel/ulysses_attn.py:165-207);
- attention-head and FFN-intermediate activation axes -> "model" (tensor
  parallel — absent in the reference; `models/dattn.py` / `models/decoder.py`
  constrain q/k/v heads and the MLP hidden on it, so the o_proj/down_proj
  contractions become local partial sums + a psum over "model").

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


def _fit_spec(dim: int, s, mesh: Mesh):
    """Largest prefix of the axis group that divides `dim` (None if none).

    Degenerate shardings (axis product > dim, or non-divisible) would be
    legal GSPMD (padded) but trigger involuntary-rematerialization fallbacks
    downstream — e.g. a 2-window audio batch fanned out over a 4-way
    ("data","seq") group. Trimming keeps tiny dryrun shapes warning-clean
    while full-size runs shard exactly as written."""
    axes = s if isinstance(s, tuple) else (s,)
    keep = []
    n = 1
    for a in axes:
        sz = mesh.shape.get(a, 1)
        if sz > 1 and dim % (n * sz) == 0:
            keep.append(a)
            n *= sz
    if not keep:
        return None
    return tuple(keep) if len(keep) > 1 else keep[0]


def constrain(x, *spec):
    """with_sharding_constraint if a mesh is active, else identity.

    Axis groups that don't divide the corresponding dim are trimmed
    (see _fit_spec) rather than padded."""
    mesh = get_mesh()
    if mesh is None:
        return x
    clean = [None if s is None else _fit_spec(d, s, mesh)
             for d, s in zip(x.shape, spec)]
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*clean)))


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


# Megatron-style TP dims for the [L, in, out]-stacked text-decoder weights:
# q/k/v/gate/up shard their OUTPUT features (heads / FFN hidden) on "model"
# so the projections are comm-free; o/down shard their CONTRACTION dim so the
# back-projections are local partial sums + one psum over "model". The other
# matmul dim is ZeRO-3-sharded over ("data","seq") (gathered at use).
_TP_DIM = {"q_w": 2, "k_w": 2, "v_w": 2, "gate_w": 2, "up_w": 2,
           "o_w": 1, "down_w": 1}


def _text_layer_spec(name: str, shape, mesh: Mesh,
                     min_size: int = 2**14) -> P:
    tp_dim = _TP_DIM[name]
    if len(shape) != 3 or int(np.prod(shape)) < min_size:
        return fsdp_param_spec(shape, mesh, min_size)
    n_model = mesh.shape.get("model", 1)
    spec = [None, None, None]
    model_used = n_model > 1 and shape[tp_dim] % n_model == 0
    if model_used:
        spec[tp_dim] = "model"
    fsdp_axes = ("data", "seq") if model_used else ("data", "seq", "model")
    other = 3 - tp_dim  # the non-L, non-TP matmul dim
    spec[other] = _fit_spec(shape[other], fsdp_axes, mesh)
    if spec == [None, None, None]:
        return fsdp_param_spec(shape, mesh, min_size)
    return P(*spec)


def _param_spec_for_path(path, leaf, mesh: Mesh) -> P:
    """TP-aware spec for text-decoder layer weights, largest-axis FSDP
    elsewhere. Works on params AND optax state (whose moment trees mirror
    the param dict paths, so q_w moments shard like q_w)."""
    names = [getattr(k, "key", None) for k in path]
    for name in reversed(names):
        # text decoder only: the towers share the q_w/... key names under
        # their own "layers" dicts but never constrain activations on
        # "model", so TP output-dim sharding there is FSDP with extra steps
        if name in _TP_DIM and "layers" in names and "text" in names:
            return _text_layer_spec(name, leaf.shape, mesh)
    if "pos_embed" in names:
        # tower positional tables broadcast-add onto ("data","seq")-fanned
        # activations; sharding their d axis forces a replicate-repartition
        # in GSPMD. They're small (<8 MB at 9B scale) — keep them whole.
        return P()
    return fsdp_param_spec(leaf.shape, mesh)


def param_shardings(params, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda p, a: NamedSharding(mesh, _param_spec_for_path(p, a, mesh)),
        params)


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, s), tree)


def shard_params(params, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda p, a: jax.device_put(
            a, NamedSharding(mesh, _param_spec_for_path(p, a, mesh))),
        params,
    )
