"""Ulysses sequence parallelism — explicit all-to-all reshards.

TPU-native rebuild of the reference's Ulysses layer
(reference: Vidi1.5_9B/vidi/model/lmm/dattn/sequence_parallel/all_to_all.py:145-271
SeqAllToAll4D/5D, ulysses_attn.py:97-212 UlyssesAttention, and the expandKV
GQA replication at ulysses_attn.py:26-94).

On TPU these are `jax.lax.all_to_all` / `all_gather` over an ICI mesh axis
inside `shard_map`, not hand-rolled NCCL wrappers. The main model path uses
GSPMD sharding constraints (parallel/sharding.py) and lets XLA insert the
collectives; this module is the explicit form for cases where manual
scheduling wins (benchmark comparisons, the ring-attention composition, and
drop-in parity with the reference's module surface).

All functions are designed to run INSIDE `shard_map` with a named `axis`.
Layouts follow the model: q [B, T, H, D] with either T or H sharded.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def seq_to_heads(x: jnp.ndarray, axis: str) -> jnp.ndarray:
    """[B, S/n, H, D] (seq-sharded view) -> [B, S, H/n, D] (head-sharded view).

    The all-to-all form of SeqAllToAll4D(scatter_idx=2, gather_idx=1)
    (all_to_all.py:145-201)."""
    return jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1, tiled=True)


def heads_to_seq(x: jnp.ndarray, axis: str) -> jnp.ndarray:
    """[B, S, H/n, D] -> [B, S/n, H, D] — the inverse reshard."""
    return jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2, tiled=True)


def expand_kv(k: jnp.ndarray, v: jnp.ndarray, num_kv_heads: int, sp_size: int):
    """GQA head replication when sp_size > num_kv_heads
    (ulysses_attn.py:26-94): repeat KV heads so each SP rank gets >= 1."""
    if sp_size <= num_kv_heads:
        return k, v
    assert sp_size % num_kv_heads == 0, (sp_size, num_kv_heads)
    rep = sp_size // num_kv_heads
    return jnp.repeat(k, rep, axis=2), jnp.repeat(v, rep, axis=2)


def ulysses_attention(
    q: jnp.ndarray,        # [B, T/n, Hq, D] — seq-sharded (inside shard_map)
    k: jnp.ndarray,        # [B, S/n, Hk', D] (Hk' already expand_kv-ed)
    v: jnp.ndarray,
    axis: str,
    attn_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
) -> jnp.ndarray:
    """Reshard seq->heads, run full-sequence local attention on the head
    shard, reshard back (ulysses_attn.py:165-207 — there via Slice/Gather
    because the trainer replicates inputs; here via true all-to-all).

    attn_fn sees full-length q/k/v with H/n heads and returns [B, T, H/n, D].
    """
    qh = seq_to_heads(q, axis)
    kh = seq_to_heads(k, axis)
    vh = seq_to_heads(v, axis)
    out = attn_fn(qh, kh, vh)
    return heads_to_seq(out, axis)


def ulysses_cross_attention_sharded(
    q: jnp.ndarray,        # [B, T, Hq, D] global
    k: jnp.ndarray,        # [B, S, Hk, D] global
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],  # [B, S] bool
    mesh: Mesh,
    *,
    sm_scale: float,
    softcap: Optional[float] = None,
    seq_axis: str = "seq",
    data_axis: str = "data",
    use_flash: bool = False,
) -> jnp.ndarray:
    """Head-sharded non-causal cross attention over the mesh's seq axis —
    the Dattn T2V/T2A pattern: tiny text queries, huge modality KV.

    Inputs arrive sharded (batch over data, KV seq over seq); the all-to-all
    moves the head dim across the seq axis so each rank attends over the FULL
    modality stream with Hq/n heads — one a2a of q plus one of the output,
    instead of gathering the huge KV.
    """
    sp = mesh.shape[seq_axis]
    hk = k.shape[2]
    if sp > hk:
        k, v = expand_kv(k, v, hk, sp)

    # q is NOT seq-sharded (text stays short); each rank slices its own head
    # shard locally. KV reshards seq->heads with one all-to-all — the cheap
    # direction, since text << modality stream.
    def body(q_, k_, v_, mask_):
        n = sp
        rank = jax.lax.axis_index(seq_axis)
        hq = q_.shape[2]
        qh = jax.lax.dynamic_slice_in_dim(q_, rank * (hq // n), hq // n, axis=2)
        kh = seq_to_heads(k_, seq_axis)  # [B', S, Hk/n, D]
        vh = seq_to_heads(v_, seq_axis)
        mask_full = jax.lax.all_gather(mask_, seq_axis, axis=1, tiled=True)
        if use_flash:
            from vidi_tpu.ops.pallas.flash_attention import flash_attention
            out = flash_attention(qh, kh, vh, mask_full, sm_scale,
                                  False, None, softcap)
        else:
            from vidi_tpu.ops.attention import cross_attention
            out = cross_attention(qh, kh, vh, kv_valid=mask_full,
                                  scale=sm_scale, softcap=softcap)
        # each rank returns its head shard; shard_map stitches the head dim
        # (no output all-gather needed — the caller's sharding decides)
        return out

    if kv_mask is None:
        kv_mask = jnp.ones(k.shape[:2], bool)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(data_axis, None, None, None),
                  P(data_axis, seq_axis, None, None),
                  P(data_axis, seq_axis, None, None),
                  P(data_axis, seq_axis)),
        out_specs=P(data_axis, None, seq_axis, None),
    )(q, k, v, kv_mask)
