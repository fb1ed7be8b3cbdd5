"""Reference (pure-jnp) attention ops for the Dattn decoder.

These are the numerics-of-record; the Pallas kernels in `ops/pallas/` must
match them. They replace the reference's flash-attn CUDA calls:

- `self_attention`: causal, optional sliding window + logit softcap — the
  Gemma2 T2T path (reference: Vidi1.5_9B/vidi/model/lmm/dattn/gemma.py:164-175
  via HF FA2).
- `cross_attention`: non-causal, KV-masked — the T2V/T2A path. Instead of the
  reference's unpad/cu_seqlens varlen machinery
  (reference: vidi/model/lmm/dattn/xattn.py:36-263), ragged batches stay dense
  and invalid KV slots are masked; that is the idiomatic XLA/TPU form.

GQA is computed by grouping query heads over KV heads without materializing
repeated K/V (the reference repeats KV in memory, xattn.py:77-78 via
repeat_kv — wasteful on HBM bandwidth).

All softmax math is fp32; inputs/outputs stay in the compute dtype (bf16).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

NEG_INF = -2.3819763e38  # matches XLA's mask value; avoids fp32 overflow


def _soft_cap(logits: jnp.ndarray, cap: Optional[float]) -> jnp.ndarray:
    if cap is None:
        return logits
    return jnp.tanh(logits / cap) * cap


def _grouped_logits(q: jnp.ndarray, k: jnp.ndarray, scale: float) -> jnp.ndarray:
    """q [B,T,Hq,D] x k [B,S,Hk,D] -> logits [B,Hk,G,T,S] (fp32)."""
    b, t, hq, d = q.shape
    hk = k.shape[2]
    assert hq % hk == 0, (hq, hk)
    g = hq // hk
    qg = q.reshape(b, t, hk, g, d)
    logits = jnp.einsum(
        "bthgd,bshd->bhgts", qg, k, preferred_element_type=jnp.float32
    )
    return logits * scale


def _attend(logits: jnp.ndarray, v: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """softmax(logits) [B,Hk,G,T,S] @ v [B,S,Hk,D] -> [B,T,Hq,D]."""
    probs = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhgts,bshd->bthgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    b, t, hk, g, d = out.shape
    return out.reshape(b, t, hk * g, d).astype(out_dtype)


def self_attention(
    q: jnp.ndarray,  # [B, T, Hq, D]
    k: jnp.ndarray,  # [B, S, Hk, D]
    v: jnp.ndarray,  # [B, S, Hk, D]
    *,
    q_positions: jnp.ndarray,  # [B, T] int32 absolute positions
    kv_positions: jnp.ndarray,  # [B, S] int32 absolute positions
    kv_valid: Optional[jnp.ndarray],  # [B, S] bool — False for pad/empty slots
    scale: float,
    sliding_window: Optional[int] = None,
    softcap: Optional[float] = None,
    q_segment_ids: Optional[jnp.ndarray] = None,   # [B, T] int32 (packing)
    kv_segment_ids: Optional[jnp.ndarray] = None,  # [B, S] int32
) -> jnp.ndarray:
    """Causal (optionally sliding-window) self attention over a KV set.

    Works for both prefill (T == S prompt tokens) and decode (T == 1 against a
    preallocated cache, with `kv_valid` masking unwritten slots).

    Segment ids implement sample packing — the TPU form of the reference's
    `set_seqlens_in_batch` varlen patch (Vidi1.5_9B/vidi/model/lmm/dattn/
    utils.py:15-38): several conversations share a row, positions restart per
    segment, and attention is block-diagonal (q attends kv only when segment
    ids match).
    """
    logits = _grouped_logits(q, k, scale)
    logits = _soft_cap(logits, softcap)

    causal = kv_positions[:, None, :] <= q_positions[:, :, None]  # [B,T,S]
    if sliding_window is not None:
        in_window = (
            q_positions[:, :, None] - kv_positions[:, None, :]
        ) < sliding_window
        causal = jnp.logical_and(causal, in_window)
    mask = causal
    if q_segment_ids is not None:
        same = q_segment_ids[:, :, None] == kv_segment_ids[:, None, :]
        mask = jnp.logical_and(mask, same)
    if kv_valid is not None:
        mask = jnp.logical_and(mask, kv_valid[:, None, :])
    logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)
    return _attend(logits, v, q.dtype)


def cross_attention(
    q: jnp.ndarray,  # [B, T, Hq, D]
    k: jnp.ndarray,  # [B, S, Hk, D]
    v: jnp.ndarray,  # [B, S, Hk, D]
    *,
    kv_valid: Optional[jnp.ndarray],  # [B, S] bool
    scale: float,
    softcap: Optional[float] = None,
) -> jnp.ndarray:
    """Non-causal text->modality cross attention with a KV validity mask."""
    logits = _grouped_logits(q, k, scale)
    logits = _soft_cap(logits, softcap)
    if kv_valid is not None:
        logits = jnp.where(
            kv_valid[:, None, None, None, :], logits, NEG_INF
        )
    return _attend(logits, v, q.dtype)


def quantized_cache_cross_attention(
    q: jnp.ndarray,  # [B, T, Hq, D] (decode: T == 1)
    kq,              # {qi8 [B,Hk,S,D] int8, scale [B,Hk,S,1] f32} decode-native
    vq,
    *,
    kv_valid: Optional[jnp.ndarray],  # [B, S] bool
    scale: float,
    softcap: Optional[float] = None,
) -> jnp.ndarray:
    """Cross attention reading per-token int8 KV caches DIRECTLY.

    The k scale folds into the logits (q . (k*s) == (q . k) * s) and the v
    scale into the probabilities, so the int8 cache feeds the dot as-is
    (int8 -> bf16 convert is exact for |x| <= 127 and fuses into the dot
    operand) — no materialized dequantized copy. Dequantize-then-attend
    reads the int8 cache AND writes+reads a full bf16 copy of it every
    decode step, which measured 1.5x SLOWER than plain bf16 caches
    (decode_tok_s 85.7 vs 126.8 on the hour-long bench).

    This is a dense (unfused) read: at T > 1 (shared-media text prefill
    against int8 caches) the fp32 logits transient is O(Hq*T*S) per layer —
    ~1.2 GB at hour-scale S with 256 folded query rows. Bounded in the
    regimes that use it: single-chip clips have small S, and hour-scale 9B
    runs on a seq mesh where S (and the transient) shard per device. If a
    tighter single-chip envelope ever needs it, the fix is an int8-reading
    flash-kernel variant, mirroring dattn._xattn_block's bf16 flash route."""
    from vidi_tpu.infer.quantize import QUANT_KEY

    ki, ks = kq[QUANT_KEY], kq["scale"]
    vi, vs = vq[QUANT_KEY], vq["scale"]
    b, t, hq, d = q.shape
    hk = ki.shape[1]
    g = hq // hk
    qg = q.reshape(b, t, hk, g, d)
    logits = jnp.einsum("bthgd,bhsd->bhgts", qg, ki.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    logits = logits * (ks[..., 0][:, :, None, None, :] * scale)
    logits = _soft_cap(logits, softcap)
    if kv_valid is not None:
        logits = jnp.where(kv_valid[:, None, None, None, :], logits, NEG_INF)
    probs = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    probs = probs * vs[..., 0][:, :, None, None, :]  # fold v scales into p
    out = jnp.einsum("bhgts,bhsd->bthgd", probs.astype(q.dtype),
                     vi.astype(q.dtype), preferred_element_type=jnp.float32)
    return out.reshape(b, t, hq, d).astype(q.dtype)
