"""Fused dynamic-quantize + int8 matmul Pallas kernel (opt-in).

Each grid step loads an x block [bm, K] bf16 once, computes per-row scales
and int8 rounding in VMEM, runs the int8 x int8 -> int32 MXU dot, and
rescales into the output dtype — so the VPU quantize work is O(M*K) rather
than the jnp form's O(M*N) rescale+requantize epilogue.

Measured on v5e (chained, full-output-consumed; raw MXU peaks 194 bf16 /
399 int8 T/s):
- isolated 768<->3072 FFN pair, M=81648: this kernel 328 T/s (bm=256)
  vs jnp dynamic_qdense 160 vs bf16 198 — the kernel wins 1.66x.
- INSIDE the 12-layer SigLIP tower (113 frames): pallas 175 ms vs jnp
  int8 104 ms vs bf16 113 ms — the kernel LOSES: XLA CSEs the one
  quantize shared by q/k/v and fuses LN->quantize->dot in the jnp form,
  while six opaque pallas calls per layer each redo the quantize and
  force HBM materialization at their boundaries.

Hence `dynamic_qdense` defaults to the jnp form; set VIDI_QMM=pallas to
route single matmuls here (profitable only for isolated large-N matmuls
that don't share activations).

Layout: x [M, K] bf16/f32, wq int8 [K, N] with per-column scales [N].
Full-K blocks (towers: K <= 3072 -> x block <= 1.5 MB at bm=256), grid
(M/bm, N/bn) with Pallas masking the partial last M block.

Forward-only (inference quantization mode); training never sees quantized
weight dicts.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Set True to run in interpreter mode (CPU tests flip this).
INTERPRET = False

_QK = "qi8"

_BM = 256
# Per-block VMEM budgets: the int8 weight tile and the int32 accumulator.
# Large N blocks matter — with bn = N the x block is DMA'd exactly once and
# the (small) tower weights stay resident across grid steps, making the
# kernel compute-bound instead of x-refetch-bound.
_W_BYTES = 4 * 2**20
_ACC_BYTES = 4 * 2**20


def _kernel(x_ref, wq_ref, ws_ref, o_ref, *, out_dtype):
    from vidi_tpu.infer.quantize import quantize_act
    xq, sx = quantize_act(x_ref[...])  # [bm, K] rows, shared quantize rule
    y = jax.lax.dot(xq, wq_ref[...], preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * sx * ws_ref[...]  # ws [1, bn]
    o_ref[...] = y.astype(out_dtype)


def _gated_kernel(x_ref, wg_ref, sg_ref, wu_ref, su_ref, h_ref, *, hidden_act):
    from vidi_tpu.infer.quantize import quantize_act
    dt = x_ref.dtype
    xq, sx = quantize_act(x_ref[...])  # the shared numerics-of-record rule
    g = jax.lax.dot(xq, wg_ref[...], preferred_element_type=jnp.int32)
    g = (g.astype(jnp.float32) * sx * sg_ref[...]).astype(dt)
    u = jax.lax.dot(xq, wu_ref[...], preferred_element_type=jnp.int32)
    u = (u.astype(jnp.float32) * sx * su_ref[...]).astype(dt)
    if hidden_act == "gelu_tanh":
        g = jax.nn.gelu(g, approximate=True)
    else:
        g = jax.nn.silu(g)
    h_ref[...] = g * u


def quant_gated_mlp(x: jnp.ndarray, gate_w, up_w, down_w,
                    hidden_act: str) -> jnp.ndarray:
    """Fused W8A8 gated FFN: act(x@gate) * (x@up) @ down, all int8 MXU dots.

    Stage 1 is one kernel over (M, ff-block) tiles — the x quantize is shared
    by the gate and up dots and the activation/mul epilogue stays on the VMEM
    tile (the jnp form runs it as a separate O(M*ff) fp32 XLA fusion). The
    bf16 hidden then feeds the existing quant_matmul for the down projection
    (full-ff rows in VMEM, so its per-row requantize matches the jnp
    numerics exactly). Weights stream per ff-block, so Gemma2-9B's 14336-wide
    FFN never needs >16 MB resident.

    MEASURED SLOWER than the jnp W8A8 path at prefill scale (gemma2-9b
    geometry, M=123k: 144.9 ms / 262 T/s fused vs 125.1 / 303 jnp vs 215.8
    bf16): XLA already fuses quantize->dot->rescale->act->mul into the MXU
    pipeline at this M, and the two opaque pallas calls force an HBM
    round-trip of the [M, ff] hidden between stage 1 and the down dot.
    Stays opt-in (VIDI_QMM_MLP=1) for geometries where XLA's epilogue
    fusion degrades; the jnp form is the production path.
    """
    *lead, d = x.shape
    ff = gate_w[_QK].shape[-1]
    m = 1
    for s in lead:
        m *= s
    x2 = x.reshape(m, d)
    bm = min(_BM, -(-m // 8) * 8)
    bn = min(ff, max(128, (_W_BYTES // d // 128) * 128))
    grid = (-(-m // bm), -(-ff // bn))
    xspec = pl.BlockSpec((bm, d), lambda i, j: (i, 0))
    wspec = pl.BlockSpec((d, bn), lambda i, j: (0, j))
    sspec = pl.BlockSpec((1, bn), lambda i, j: (0, j))
    h = pl.pallas_call(
        functools.partial(_gated_kernel, hidden_act=hidden_act),
        grid=grid,
        in_specs=[xspec, wspec, sspec, wspec, sspec],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, ff), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 2**20),
        interpret=INTERPRET,
    )(x2, gate_w[_QK], gate_w["scale"].reshape(1, ff).astype(jnp.float32),
      up_w[_QK], up_w["scale"].reshape(1, ff).astype(jnp.float32))
    out = quant_matmul(h, down_w[_QK], down_w["scale"][..., 0, :])
    return out.reshape(*lead, d)


def gated_mlp_ok(lp, x) -> bool:
    """Shape/dtype gate for quant_gated_mlp (int8 dicts, lane-tiled dims)."""
    import os
    if os.environ.get("VIDI_QMM_MLP", "0") != "1":
        return False
    if not (INTERPRET or jax.default_backend() != "cpu"):
        return False
    # multi-device meshes fall back to the jnp path (same guard as
    # fused_tower_layer.use_fused): GSPMD cannot partition an opaque
    # pallas_call and would all-gather TP-sharded gate/up/down per device
    from vidi_tpu.parallel.sharding import get_mesh
    mesh = get_mesh()
    if mesh is not None and mesh.size > 1:
        return False
    for k in ("gate_w", "up_w", "down_w"):
        if not (isinstance(lp.get(k), dict) and _QK in lp[k]):
            return False
    d = x.shape[-1]
    ff = lp["gate_w"][_QK].shape[-1]
    return d % 128 == 0 and ff % 128 == 0


def quant_matmul(x: jnp.ndarray, wq: jnp.ndarray, wscale: jnp.ndarray,
                 bias=None) -> jnp.ndarray:
    """x [..., K] @ wq int8 [K, N] (per-column scales [N]) -> [..., N]."""
    *lead, k = x.shape
    n = wq.shape[1]
    m = 1
    for s in lead:
        m *= s
    x2 = x.reshape(m, k)
    bm = min(_BM, -(-m // 8) * 8)
    bn_cap = min(_W_BYTES // k, _ACC_BYTES // (bm * 4))
    bn = min(n, max(128, (bn_cap // 128) * 128))
    grid = (-(-m // bm), -(-n // bn))
    out = pl.pallas_call(
        functools.partial(_kernel, out_dtype=x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # double-buffered x/w/out tiles exceed the default 16 MB scoped
            # budget at K=14336 (gemma2-9b FFN down-proj: 21.25 MB measured)
            vmem_limit_bytes=64 * 2**20),
        interpret=INTERPRET,
    )(x2, wq, wscale.reshape(1, n).astype(jnp.float32))
    out = out.reshape(*lead, n)
    if bias is not None:
        out = out + bias
    return out
