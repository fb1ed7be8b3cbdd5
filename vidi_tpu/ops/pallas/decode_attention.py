"""Pallas TPU decode attention: one query token vs a large KV cache.

Covers the decode-step reads of all three Dattn caches (SURVEY.md §7 kernel
(c)): causal text cache (validity mask carries the <= cur_len constraint,
optional Gemma2 sliding window via the query position), and the non-causal
image/audio caches (mask only).

Decode is HBM-bandwidth-bound: the kernel streams K/V blocks through VMEM
once, keeping fp32 online-softmax state in scratch — no [S] logits round-trip
to HBM and no head-replicated KV (GQA group rows share the KV block).

Layout: q [B, Hq, D]; k/v in the cache-native decode layout [B, Hk, S, D]
(the (S, D) minor dims tile cleanly on TPU — blocking the head axis of a
[B, S, Hk, D] array is not lowerable); kv_mask [B, S]; q_pos [B] int32
(read only when `window` is set). Output [B, Hq, D].
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)
INTERPRET = False
DEFAULT_BLOCK_K = 512


def _kernel(qpos_ref, q_ref, k_ref, v_ref, mask_ref, o_ref,
            m_scr, l_scr, acc_scr, *, sm_scale, softcap, window, num_s_blocks,
            s_total):
    s_idx = pl.program_id(2)
    bk = k_ref.shape[2]
    g = q_ref.shape[2]  # GQA group rows sharing this KV head

    @pl.when(s_idx == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    q = q_ref[0, 0]         # [g, D]
    k = k_ref[0, 0]         # [bk, D]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    if softcap is not None:
        s = jnp.tanh(s / softcap) * softcap

    cols = jax.lax.broadcasted_iota(jnp.int32, (g, bk), 1) + s_idx * bk
    valid = jnp.broadcast_to(mask_ref[...].reshape(1, bk) != 0, (g, bk))
    # bounds mask: the last block may read past S (grid is cdiv-padded)
    valid = jnp.logical_and(valid, cols < s_total)
    if window is not None:
        qpos = qpos_ref[pl.program_id(0)]
        valid = jnp.logical_and(valid, qpos - cols < window)
    s = jnp.where(valid, s, MASK_VALUE)

    m_prev = m_scr[...]                       # [g, 128]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])
    p = jnp.where(valid, p, 0.0)  # OOB lanes may hold garbage k values
    l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = m_next
    acc_scr[...] = acc_scr[...] * alpha[:, :1] + jax.lax.dot(
        p.astype(v_ref.dtype), v_ref[0, 0], preferred_element_type=jnp.float32)

    @pl.when(s_idx == num_s_blocks - 1)
    def _store():
        l = l_scr[...]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l_safe[:, :1]).astype(o_ref.dtype)


def decode_attention(
    q: jnp.ndarray,                 # [B, Hq, D]
    k: jnp.ndarray,                 # [B, Hk, S, D] — cache-native layout
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],  # [B, S] bool/int — False = invalid slot
    sm_scale: float,
    softcap: Optional[float] = None,
    window: Optional[int] = None,
    q_pos: Optional[jnp.ndarray] = None,  # [B] int32; required when window set
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    b, hq, d = q.shape
    hk, s = k.shape[1], k.shape[2]
    g = hq // hk
    bk = min(block_k, s)
    n_s = pl.cdiv(s, bk)

    if kv_mask is None:
        kv_mask = jnp.ones((b, s), jnp.int32)
    kv_mask = kv_mask.astype(jnp.int32)[:, None, :]  # [B, 1, S] (tiling)
    qg = q.reshape(b, hk, g, d)
    if q_pos is None:
        q_pos = jnp.zeros((b,), jnp.int32)
    q_pos = q_pos.astype(jnp.int32)  # [B], whole array in SMEM

    kernel = functools.partial(
        _kernel, sm_scale=sm_scale, softcap=softcap, window=window,
        num_s_blocks=n_s, s_total=s)
    grid = (b, hk, n_s)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # q_pos [B], unblocked
            pl.BlockSpec((1, 1, g, d), lambda b_, h, j: (b_, h, 0, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda b_, h, j: (b_, h, j, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda b_, h, j: (b_, h, j, 0)),
            pl.BlockSpec((1, 1, bk), lambda b_, h, j: (b_, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, 1, g, d), lambda b_, h, j: (b_, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hk, g, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(q_pos, qg, k, v, kv_mask)
    return out.reshape(b, hq, d)
