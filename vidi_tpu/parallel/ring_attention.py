"""Ring attention over the mesh seq axis — the reference's unbuilt slot.

The reference builds ring/hybrid process groups but ships NO ring attention
kernel (reference: Vidi1.5_9B/.../sequence_parallel/globals.py:86-150 builds
the groups; SURVEY.md §2.5 "scaffolding only"). This module completes it the
TPU way: the modality KV stays sharded over the "seq" axis, and KV blocks
rotate around the ICI ring via `jax.lax.ppermute` while every rank accumulates
flash-attention partials with a numerically-stable log-sum-exp merge.

Memory: each rank only ever holds 1/n of the modality KV (vs Ulysses'
head-resharded full-KV) — this is the >HBM regime for ~1M-token hour-long
streams. Compute/communication overlap comes from XLA's latency-hiding
scheduler: the ppermute of step i+1 is independent of step i's flash matmuls.

Non-causal (the Dattn cross-attention pattern: text queries x modality KV).
Autodiff works end-to-end: the local step uses flash_attention's custom VJP
(or the jnp reference path on CPU), and the combine is plain jnp math.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_BIG = 1e30  # sentinel threshold: flash lse for fully-masked rows is ~+1e38


def _local_attn_lse(q, k, v, kv_mask, sm_scale, softcap, use_flash):
    """-> (out [B,T,H,D] normalized, lse [B,T,H] fp32; -inf for empty rows)."""
    if use_flash:
        from vidi_tpu.ops.pallas.flash_attention import _flash_forward
        out, lse = _flash_forward(q, k, v, kv_mask, sm_scale, False, None,
                                  softcap, 256, 256)
        lse = lse[..., 0]  # [B, H, T] lane-replicated -> one lane
        lse = jnp.where(lse > _BIG, -jnp.inf, lse)  # empty rows
        return out, jnp.transpose(lse, (0, 2, 1))
    # jnp reference path (CPU tests / tiny shapes)
    from vidi_tpu.ops.attention import NEG_INF, _grouped_logits, _soft_cap

    logits = _grouped_logits(q, k, sm_scale)  # [B, Hk, G, T, S]
    logits = _soft_cap(logits, softcap)
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, None, :], logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    m_safe = jnp.where(m > NEG_INF / 2, m, 0.0)
    p = jnp.exp(logits - m_safe)  # masked entries: exp(NEG_INF) == 0 exactly
    l = jnp.sum(p, axis=-1, keepdims=True)
    b, hk, g, t, s = logits.shape
    out = jnp.einsum("bhgts,bshd->bthgd", p / jnp.maximum(l, 1e-30), v,
                     preferred_element_type=jnp.float32)
    out = out.reshape(b, t, hk * g, -1).astype(q.dtype)
    lse = jnp.where(l[..., 0] > 0,
                    m_safe[..., 0] + jnp.log(jnp.maximum(l[..., 0], 1e-30)),
                    -jnp.inf)  # [B, Hk, G, T]
    lse = jnp.transpose(lse, (0, 3, 1, 2)).reshape(b, t, hk * g)
    return out, lse


def _combine(out_a, lse_a, out_b, lse_b):
    """Merge two normalized attention partials by their log-sum-exp weights."""
    m = jnp.maximum(lse_a, lse_b)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    wa = jnp.where(jnp.isfinite(lse_a), jnp.exp(lse_a - m_safe), 0.0)
    wb = jnp.where(jnp.isfinite(lse_b), jnp.exp(lse_b - m_safe), 0.0)
    l = wa + wb
    l_safe = jnp.maximum(l, 1e-30)
    out = (out_a.astype(jnp.float32) * (wa / l_safe)[..., None]
           + out_b.astype(jnp.float32) * (wb / l_safe)[..., None])
    lse = jnp.where(l > 0, m_safe + jnp.log(l_safe), -jnp.inf)
    return out.astype(out_a.dtype), lse


def ring_cross_attention_local(
    q: jnp.ndarray,          # [B, T, Hq, D] (replicated across the ring)
    k: jnp.ndarray,          # [B, S/n, Hk, D] (this rank's KV shard)
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],  # [B, S/n]
    *,
    axis: str,
    axis_size: int,
    sm_scale: float,
    softcap: Optional[float] = None,
    use_flash: bool = False,
) -> jnp.ndarray:
    """Runs INSIDE shard_map. Rotates (k, v, mask) around `axis` and merges
    flash partials. Returns the full attention output [B, T, Hq, D]."""
    if kv_mask is None:
        kv_mask = jnp.ones(k.shape[:2], bool)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    # mark the carries varying over the ring axis (shard_map tracks per-axis
    # "varying" state through scan; the merged output varies over `axis`)
    out = q * jnp.zeros((), q.dtype)
    lse = q[..., 0].astype(jnp.float32) * 0.0 - jnp.inf
    if hasattr(jax.lax, "pcast"):
        out = jax.lax.pcast(out, (axis,), to="varying")
        lse = jax.lax.pcast(lse, (axis,), to="varying")

    def step(carry, _):
        k_, v_, mask_, out_, lse_ = carry
        o_i, lse_i = _local_attn_lse(q, k_, v_, mask_, sm_scale, softcap,
                                     use_flash)
        out_, lse_ = _combine(out_, lse_, o_i, lse_i)
        k_ = jax.lax.ppermute(k_, axis, perm)
        v_ = jax.lax.ppermute(v_, axis, perm)
        mask_ = jax.lax.ppermute(mask_, axis, perm)
        return (k_, v_, mask_, out_, lse_), None

    (_, _, _, out, lse), _ = jax.lax.scan(
        step, (k, v, kv_mask, out, lse), None, length=axis_size)
    # after the full rotation every rank holds the identical merged output;
    # pmean (a tiny text-sized all-reduce) turns "varying" into "replicated"
    # so callers can declare a seq-replicated out_spec
    return jax.lax.pmean(out, axis)


def ring_cross_attention(
    q: jnp.ndarray,          # [B, T, Hq, D] global
    k: jnp.ndarray,          # [B, S, Hk, D] global
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
    """shard_map entry: batch over `data_axis`, KV sequence over `seq_axis`;
    q replicated over seq. Output replicated over seq (like the reference's
    Gather at ulysses_attn.py:204-207)."""
    shard_map = jax.shard_map

    n = mesh.shape[seq_axis]
    if kv_mask is None:
        kv_mask = jnp.ones(k.shape[:2], bool)

    body = functools.partial(
        ring_cross_attention_local, axis=seq_axis, axis_size=n,
        sm_scale=sm_scale, softcap=softcap, use_flash=use_flash)

    return shard_map(
        lambda q_, k_, v_, m_: body(q_, k_, v_, m_),
        mesh=mesh,
        in_specs=(P(data_axis, None, None, None),
                  P(data_axis, seq_axis, None, None),
                  P(data_axis, seq_axis, None, None),
                  P(data_axis, seq_axis)),
        out_specs=P(data_axis, None, None, None),
    )(q, k, v, kv_mask)
