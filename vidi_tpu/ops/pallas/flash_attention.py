"""Pallas TPU flash attention for the Dattn decoder.

One kernel family covers both of the reference's flash-attn uses
(reference: Vidi1.5_9B/vidi/model/lmm/dattn/xattn.py:141-263 and the HF FA2
self-attention path):

- causal self-attention with Gemma2 sliding window + logit softcap;
- non-causal text->modality cross attention with a KV validity mask
  (replacing the varlen/unpad machinery with dense masking);
- packed-sample block-diagonal attention via int32 segment ids (the TPU form
  of the reference's varlen packing patch, utils.py:15-38): tiles whose
  q/kv segment ranges don't intersect are skipped BEFORE the matmul, so a
  packed row costs ~sum of per-segment O(len^2), not O(T^2).

Design (see /opt/skills/guides/boom_attention_tricks.md):
- grid (B, Hq, T/bq, S/bk); S is the "arbitrary" online-softmax reduction;
- fp32 running max/sum/accumulator in VMEM scratch; unnormalized accumulator,
  one divide at the end;
- GQA without repeating KV: the k/v BlockSpec index maps q head h to KV head
  h // group;
- causal/sliding tiles fully outside the band are skipped before the matmul;
- custom VJP: forward saves only logsumexp L; backward recomputes scores in
  two kernels (dq over S; dkv over (G, T)) with di = sum(o*do) precomputed.

Layout: q [B, T, Hq, D], k/v [B, S, Hk, D], kv_mask [B, S] (int32 0/1).
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
# Set True to run kernels in interpreter mode (CPU tests).
INTERPRET = False
# 256x256 measured best on v5e (512 spills VMEM at D=128 with the fp32
# accumulator; 128 doubles grid overhead). VIDI_FLASH_BLOCK overrides for
# experiments.
import os as _os
DEFAULT_BLOCK_Q = int(_os.environ.get("VIDI_FLASH_BLOCK", 256))
DEFAULT_BLOCK_K = int(_os.environ.get("VIDI_FLASH_BLOCK", 256))


def _band_check(t_idx, s_idx, bq, bk, causal: bool, window: Optional[int]):
    """Whether block (t_idx, s_idx) intersects the visible band."""
    run = True
    if causal:
        run = jnp.logical_and(run, s_idx * bk <= (t_idx + 1) * bq - 1)
    if window is not None:
        run = jnp.logical_and(run, (s_idx + 1) * bk - 1 >= t_idx * bq - window + 1)
    return run


def _tile_logits(q, k, sm_scale, softcap):
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s * sm_scale
    if softcap is not None:
        s = jnp.tanh(s / softcap) * softcap
    return s


def _tile_mask(t_idx, s_idx, bq, bk, mask_row, causal: bool,
               window: Optional[int], qseg_col=None, kseg_row=None):
    """Combined validity mask for one (bq, bk) tile; mask_row is [1, bk];
    qseg_col [bq, 1] / kseg_row [1, bk] are packing segment ids (0 = pad)."""
    m = jnp.broadcast_to(mask_row.reshape(1, bk) != 0, (bq, bk))
    if causal or window is not None:
        rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + t_idx * bq
        cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + s_idx * bk
        if causal:
            m = jnp.logical_and(m, cols <= rows)
        if window is not None:
            m = jnp.logical_and(m, rows - cols < window)
    if qseg_col is not None:
        m = jnp.logical_and(m, qseg_col == kseg_row)
    return m


def _seg_tiles(qseg_ref, kseg_ref):
    """-> (qseg_col [bq,1], kseg_row [1,bk]) from the lane/sublane-replicated
    staging layouts (q segs [B,Tp,128], kv segs [B,8,Sp])."""
    return qseg_ref[0][:, :1], kseg_ref[0][:1, :]


def _seg_overlap(qseg_col, kseg_row):
    """Whether any q row and kv col in the tile share a nonzero segment.

    Packed segment ids are contiguous and ascending within a row (pad = 0),
    so each tile's nonzero ids form a range [min_nz, max]; two tiles interact
    iff those ranges intersect. Computed from the tiny seg tiles only — this
    is the block-skip that makes packed attention ~sum(len_i^2), not T^2."""
    big = jnp.int32(1 << 30)
    q_min = jnp.min(jnp.where(qseg_col == 0, big, qseg_col))
    k_min = jnp.min(jnp.where(kseg_row == 0, big, kseg_row))
    return jnp.logical_and(jnp.max(qseg_col) >= k_min,
                           jnp.max(kseg_row) >= q_min)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(*refs, sm_scale, causal, window, softcap, num_s_blocks,
                has_segs):
    if has_segs:
        (q_ref, k_ref, v_ref, mask_ref, qseg_ref, kseg_ref,
         o_ref, lse_ref, m_scr, l_scr, acc_scr) = refs
    else:
        (q_ref, k_ref, v_ref, mask_ref,
         o_ref, lse_ref, m_scr, l_scr, acc_scr) = refs
    t_idx = pl.program_id(2)
    s_idx = pl.program_id(3)
    bq = q_ref.shape[2]
    bk = k_ref.shape[2]

    @pl.when(s_idx == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    run = _band_check(t_idx, s_idx, bq, bk, causal, window)
    if has_segs:
        qseg_col, kseg_row = _seg_tiles(qseg_ref, kseg_ref)
        run = jnp.logical_and(run, _seg_overlap(qseg_col, kseg_row))
    else:
        qseg_col = kseg_row = None

    @pl.when(run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = _tile_logits(q, k, sm_scale, softcap)
        mask = _tile_mask(t_idx, s_idx, bq, bk, mask_ref[...], causal, window,
                          qseg_col, kseg_row)
        s = jnp.where(mask, s, MASK_VALUE)

        m_prev = m_scr[...]  # [bq, 128] lane-replicated
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        # fully-masked rows: keep l at 0 so _store emits zeros + sentinel lse
        # (exp(MASK - MASK) == 1 would otherwise average V over the tile)
        p = jnp.where(mask, p, 0.0)
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next

        acc_scr[...] = acc_scr[...] * alpha[:, :1]
        v = v_ref[0, 0]
        acc_scr[...] += jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(s_idx == num_s_blocks - 1)
    def _store():
        l = l_scr[...]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l_safe[:, :1]).astype(o_ref.dtype)
        m = m_scr[...]
        lse = m + jnp.log(l_safe)
        lse = jnp.where(l == 0.0, -MASK_VALUE, lse)  # pad rows -> p=exp(z-big)=0
        lse_ref[0, 0] = lse.astype(jnp.float32)


def _pad_to(x, axis, mult):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _seg_arrays(q_segs, kv_segs, b, bq, bk):
    """Stage segment ids in kernel-friendly layouts: q segs lane-replicated
    [B, Tp, 128]; kv segs sublane-replicated [B, 8, Sp] (pad id 0)."""
    qs = _pad_to(q_segs.astype(jnp.int32), 1, bq)
    ks = _pad_to(kv_segs.astype(jnp.int32), 1, bk)
    qarr = jnp.broadcast_to(qs[:, :, None], (b, qs.shape[1], 128))
    karr = jnp.broadcast_to(ks[:, None, :], (b, 8, ks.shape[1]))
    return qarr, karr


def _flash_forward(q, k, v, kv_mask, sm_scale, causal, window, softcap,
                   block_q, block_k, q_segs=None, kv_segs=None):
    b, t, hq, d = q.shape
    s, hk = k.shape[1], k.shape[2]
    g = hq // hk
    bq = min(block_q, max(t, 128))
    bk = min(block_k, max(s, 128))

    qt = _pad_to(jnp.transpose(q, (0, 2, 1, 3)), 2, bq)
    kt = _pad_to(jnp.transpose(k, (0, 2, 1, 3)), 2, bk)
    vt = _pad_to(jnp.transpose(v, (0, 2, 1, 3)), 2, bk)
    if kv_mask is None:
        kv_mask = jnp.ones((b, s), jnp.int32)
    mask = _pad_to(kv_mask.astype(jnp.int32), 1, bk)[:, None, :]  # [B, 1, Sp]

    tp, sp = qt.shape[2], kt.shape[2]
    n_t, n_s = tp // bq, sp // bk
    grid = (b, hq, n_t, n_s)

    has_segs = q_segs is not None
    kernel = functools.partial(
        _fwd_kernel, sm_scale=sm_scale, causal=causal, window=window,
        softcap=softcap, num_s_blocks=n_s, has_segs=has_segs)

    inputs = [qt, kt, vt, mask]
    in_specs = [
        pl.BlockSpec((1, 1, bq, d), lambda b_, h, i, j: (b_, h, i, 0)),
        pl.BlockSpec((1, 1, bk, d), lambda b_, h, i, j, g=g: (b_, h // g, j, 0)),
        pl.BlockSpec((1, 1, bk, d), lambda b_, h, i, j, g=g: (b_, h // g, j, 0)),
        pl.BlockSpec((1, 1, bk), lambda b_, h, i, j: (b_, 0, j)),
    ]
    if has_segs:
        qarr, karr = _seg_arrays(q_segs, kv_segs, b, bq, bk)
        inputs += [qarr, karr]
        in_specs += [
            pl.BlockSpec((1, bq, 128), lambda b_, h, i, j: (b_, i, 0)),
            pl.BlockSpec((1, 8, bk), lambda b_, h, i, j: (b_, 0, j)),
        ]

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b_, h, i, j: (b_, h, i, 0)),
            pl.BlockSpec((1, 1, bq, 128), lambda b_, h, i, j: (b_, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, tp, d), q.dtype),
            jax.ShapeDtypeStruct((b, hq, tp, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(*inputs)
    out = jnp.transpose(out[:, :, :t], (0, 2, 1, 3))
    return out, lse[:, :, :t, :]  # [B, Hq, T, 128] lane-replicated


# ---------------------------------------------------------------------------
# Backward: dq kernel (accumulate over S blocks)
# ---------------------------------------------------------------------------

def _dq_kernel(*refs, sm_scale, causal, window, softcap, num_s_blocks,
               has_segs):
    if has_segs:
        (q_ref, k_ref, v_ref, mask_ref, qseg_ref, kseg_ref, do_ref, lse_ref,
         di_ref, dq_ref, dq_scr) = refs
    else:
        (q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, di_ref,
         dq_ref, dq_scr) = refs
    t_idx = pl.program_id(2)
    s_idx = pl.program_id(3)
    bq = q_ref.shape[2]
    bk = k_ref.shape[2]

    @pl.when(s_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros(dq_scr.shape, jnp.float32)

    run = _band_check(t_idx, s_idx, bq, bk, causal, window)
    if has_segs:
        qseg_col, kseg_row = _seg_tiles(qseg_ref, kseg_ref)
        run = jnp.logical_and(run, _seg_overlap(qseg_col, kseg_row))
    else:
        qseg_col = kseg_row = None

    @pl.when(run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        raw = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        if softcap is not None:
            tanh_term = jnp.tanh(raw / softcap)
            z = tanh_term * softcap
        else:
            z = raw
        mask = _tile_mask(t_idx, s_idx, bq, bk, mask_ref[...], causal, window,
                          qseg_col, kseg_row)
        z = jnp.where(mask, z, MASK_VALUE)
        p = jnp.exp(z - lse_ref[0, 0][:, :1])  # [bq, bk]

        do = do_ref[0, 0].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dz = p * (dp - di_ref[0, 0][:, :1])
        if softcap is not None:
            dz = dz * (1.0 - tanh_term * tanh_term)
        dz = jnp.where(mask, dz, 0.0)
        dq_scr[...] += jax.lax.dot(
            dz.astype(jnp.float32), k.astype(jnp.float32),
            preferred_element_type=jnp.float32) * sm_scale

    @pl.when(s_idx == num_s_blocks - 1)
    def _store():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# Backward: dkv kernel (accumulate over (G, T) blocks per KV head)
# ---------------------------------------------------------------------------

def _dkv_kernel(*refs, sm_scale, causal, window, softcap, num_t_blocks,
                num_g, has_segs):
    if has_segs:
        (q_ref, k_ref, v_ref, mask_ref, qseg_ref, kseg_ref, do_ref, lse_ref,
         di_ref, dk_ref, dv_ref, dk_scr, dv_scr) = refs
    else:
        (q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, di_ref,
         dk_ref, dv_ref, dk_scr, dv_scr) = refs
    s_idx = pl.program_id(2)
    g_idx = pl.program_id(3)
    t_idx = pl.program_id(4)
    bq = q_ref.shape[2]
    bk = k_ref.shape[2]

    @pl.when(jnp.logical_and(g_idx == 0, t_idx == 0))
    def _init():
        dk_scr[...] = jnp.zeros(dk_scr.shape, jnp.float32)
        dv_scr[...] = jnp.zeros(dv_scr.shape, jnp.float32)

    run = _band_check(t_idx, s_idx, bq, bk, causal, window)
    if has_segs:
        qseg_col, kseg_row = _seg_tiles(qseg_ref, kseg_ref)
        run = jnp.logical_and(run, _seg_overlap(qseg_col, kseg_row))
    else:
        qseg_col = kseg_row = None

    @pl.when(run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        raw = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        if softcap is not None:
            tanh_term = jnp.tanh(raw / softcap)
            z = tanh_term * softcap
        else:
            z = raw
        mask = _tile_mask(t_idx, s_idx, bq, bk, mask_ref[...], causal, window,
                          qseg_col, kseg_row)
        z = jnp.where(mask, z, MASK_VALUE)
        p = jnp.exp(z - lse_ref[0, 0][:, :1])  # [bq, bk]

        do = do_ref[0, 0].astype(jnp.float32)
        # dv += p^T @ do
        dv_scr[...] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dz = p * (dp - di_ref[0, 0][:, :1])
        if softcap is not None:
            dz = dz * (1.0 - tanh_term * tanh_term)
        dz = jnp.where(mask, dz, 0.0)
        # dk += dz^T @ q * scale
        dk_scr[...] += jax.lax.dot_general(
            dz, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale

    @pl.when(jnp.logical_and(g_idx == num_g - 1, t_idx == num_t_blocks - 1))
    def _store():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def flash_attention(q, k, v, kv_mask, sm_scale: float, causal: bool = False,
                    window: Optional[int] = None, softcap: Optional[float] = None,
                    block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K,
                    q_segs=None, kv_segs=None):
    """Flash attention. q [B,T,Hq,D]; k/v [B,S,Hk,D]; kv_mask [B,S] or None.
    q_segs/kv_segs [B,T]/[B,S] int32 packing segment ids (0 = pad) make
    attention block-diagonal over segments, with non-intersecting tiles
    skipped (custom_vjp positional-call note: pass block_q/block_k too).

    Fully-masked query rows return zeros (the caller decides their meaning,
    matching gemma.py:192's explicit zeroing).
    """
    out, _ = _flash_forward(q, k, v, kv_mask, sm_scale, causal, window,
                            softcap, block_q, block_k, q_segs, kv_segs)
    return out


def _fwd_rule(q, k, v, kv_mask, sm_scale, causal, window, softcap, block_q,
              block_k, q_segs=None, kv_segs=None):
    out, lse = _flash_forward(q, k, v, kv_mask, sm_scale, causal, window,
                              softcap, block_q, block_k, q_segs, kv_segs)
    return out, (q, k, v, kv_mask, out, lse, q_segs, kv_segs)


def _bwd_rule(sm_scale, causal, window, softcap, block_q, block_k, res, do):
    q, k, v, kv_mask, out, lse, q_segs, kv_segs = res
    b, t, hq, d = q.shape
    s, hk = k.shape[1], k.shape[2]
    g = hq // hk
    bq = min(block_q, max(t, 128))
    bk = min(block_k, max(s, 128))

    di = jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    di = jnp.transpose(di, (0, 2, 1))[..., None]  # [B, Hq, T, 1]
    di = jnp.broadcast_to(di, (*di.shape[:3], 128))

    qt = _pad_to(jnp.transpose(q, (0, 2, 1, 3)), 2, bq)
    kt = _pad_to(jnp.transpose(k, (0, 2, 1, 3)), 2, bk)
    vt = _pad_to(jnp.transpose(v, (0, 2, 1, 3)), 2, bk)
    dot = _pad_to(jnp.transpose(do, (0, 2, 1, 3)), 2, bq)
    if kv_mask is None:
        mask = jnp.ones((b, s), jnp.int32)
    else:
        mask = kv_mask.astype(jnp.int32)
    mask = _pad_to(mask, 1, bk)[:, None, :]  # [B, 1, Sp]
    # pad rows need p = exp(z - big) = 0: pad lse with -MASK_VALUE (large+)
    lse_p = _pad_to(lse, 2, bq)
    if t % bq != 0:
        row_ids = jnp.arange(lse_p.shape[2])
        lse_p = jnp.where(row_ids[None, None, :, None] < t, lse_p, -MASK_VALUE)
    di_p = _pad_to(di, 2, bq)

    tp, sp = qt.shape[2], kt.shape[2]
    n_t, n_s = tp // bq, sp // bk

    has_segs = q_segs is not None
    if has_segs:
        qarr, karr = _seg_arrays(q_segs, kv_segs, b, bq, bk)

    dq_kernel = functools.partial(
        _dq_kernel, sm_scale=sm_scale, causal=causal, window=window,
        softcap=softcap, num_s_blocks=n_s, has_segs=has_segs)
    dq_inputs = [qt, kt, vt, mask]
    dq_specs = [
        pl.BlockSpec((1, 1, bq, d), lambda b_, h, i, j: (b_, h, i, 0)),
        pl.BlockSpec((1, 1, bk, d), lambda b_, h, i, j, g=g: (b_, h // g, j, 0)),
        pl.BlockSpec((1, 1, bk, d), lambda b_, h, i, j, g=g: (b_, h // g, j, 0)),
        pl.BlockSpec((1, 1, bk), lambda b_, h, i, j: (b_, 0, j)),
    ]
    if has_segs:
        dq_inputs += [qarr, karr]
        dq_specs += [
            pl.BlockSpec((1, bq, 128), lambda b_, h, i, j: (b_, i, 0)),
            pl.BlockSpec((1, 8, bk), lambda b_, h, i, j: (b_, 0, j)),
        ]
    dq_inputs += [dot, lse_p, di_p]
    dq_specs += [
        pl.BlockSpec((1, 1, bq, d), lambda b_, h, i, j: (b_, h, i, 0)),
        pl.BlockSpec((1, 1, bq, 128), lambda b_, h, i, j: (b_, h, i, 0)),
        pl.BlockSpec((1, 1, bq, 128), lambda b_, h, i, j: (b_, h, i, 0)),
    ]
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, hq, n_t, n_s),
        in_specs=dq_specs,
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b_, h, i, j: (b_, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hq, tp, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(*dq_inputs)

    dkv_kernel = functools.partial(
        _dkv_kernel, sm_scale=sm_scale, causal=causal, window=window,
        softcap=softcap, num_t_blocks=n_t, num_g=g, has_segs=has_segs)
    dkv_inputs = [qt, kt, vt, mask]
    dkv_specs = [
        pl.BlockSpec((1, 1, bq, d),
                     lambda b_, h, j, gi, i, g=g: (b_, h * g + gi, i, 0)),
        pl.BlockSpec((1, 1, bk, d), lambda b_, h, j, gi, i: (b_, h, j, 0)),
        pl.BlockSpec((1, 1, bk, d), lambda b_, h, j, gi, i: (b_, h, j, 0)),
        pl.BlockSpec((1, 1, bk), lambda b_, h, j, gi, i: (b_, 0, j)),
    ]
    if has_segs:
        dkv_inputs += [qarr, karr]
        dkv_specs += [
            pl.BlockSpec((1, bq, 128), lambda b_, h, j, gi, i: (b_, i, 0)),
            pl.BlockSpec((1, 8, bk), lambda b_, h, j, gi, i: (b_, 0, j)),
        ]
    dkv_inputs += [dot, lse_p, di_p]
    dkv_specs += [
        pl.BlockSpec((1, 1, bq, d),
                     lambda b_, h, j, gi, i, g=g: (b_, h * g + gi, i, 0)),
        pl.BlockSpec((1, 1, bq, 128),
                     lambda b_, h, j, gi, i, g=g: (b_, h * g + gi, i, 0)),
        pl.BlockSpec((1, 1, bq, 128),
                     lambda b_, h, j, gi, i, g=g: (b_, h * g + gi, i, 0)),
    ]
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b, hk, n_s, g, n_t),
        in_specs=dkv_specs,
        out_specs=[
            pl.BlockSpec((1, 1, bk, d), lambda b_, h, j, gi, i: (b_, h, j, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda b_, h, j, gi, i: (b_, h, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hk, sp, d), k.dtype),
            jax.ShapeDtypeStruct((b, hk, sp, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(*dkv_inputs)

    dq = jnp.transpose(dq[:, :, :t], (0, 2, 1, 3))
    dk = jnp.transpose(dk[:, :, :s], (0, 2, 1, 3))
    dv = jnp.transpose(dv[:, :, :s], (0, 2, 1, 3))
    return dq, dk, dv, None, None, None


flash_attention.defvjp(_fwd_rule, _bwd_rule)
