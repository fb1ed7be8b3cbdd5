"""Vision tower (SigLIP or CLIP ViT), functional JAX.

Re-implements the HF SiglipVisionModel encoder used by the 9B reference
(reference: Vidi1.5_9B/vidi/model/mm_vision/siglip.py:21-48): patch conv +
learned position embeddings + pre-norm transformer; and the CLIPVisionModel
used by the 7B (reference: Vidi_7B/model/mm_vision/clip.py:10-26), which adds
a class token, a post-embedding pre-layernorm, and quick-gelu — selected by
`VisionConfig.arch`. Both taps `hidden_states[select_layer]` with
select_layer = -2, i.e. the output of the second-to-last encoder layer,
skipping the final layer / post-layernorm / pooling head — so those are not
computed on the feature path. CLIP patch features drop the class token
(clip.py:23-25) — `forward_features` returns patch tokens only for both.

TPU-first choices:
- patch embedding as an explicit patch-extract + matmul (guaranteed MXU);
- per-layer params stacked on a leading [L, ...] axis and the encoder run as
  one `lax.scan` (fast compiles at 27 layers, natural remat boundary);
- frame batches are sharded over the ("data","seq") mesh axes by the caller
  (the Ulysses frame fan-out equivalent, reference split.py:72-93).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from vidi_tpu.core.config import VisionConfig
from vidi_tpu.ops.basic import dense, layer_norm, mha, tower_act

Params = Dict


def init_params(key, cfg: VisionConfig, dtype=jnp.float32) -> Params:
    d, ff, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    keys = jax.random.split(key, 8)

    def nrm(k, shape, scale):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    layers = {
        "ln1_scale": jnp.ones((L, d), dtype),
        "ln1_bias": jnp.zeros((L, d), dtype),
        "q_w": nrm(keys[0], (L, d, d), d**-0.5),
        "q_b": jnp.zeros((L, d), dtype),
        "k_w": nrm(keys[1], (L, d, d), d**-0.5),
        "k_b": jnp.zeros((L, d), dtype),
        "v_w": nrm(keys[2], (L, d, d), d**-0.5),
        "v_b": jnp.zeros((L, d), dtype),
        "o_w": nrm(keys[3], (L, d, d), d**-0.5),
        "o_b": jnp.zeros((L, d), dtype),
        "ln2_scale": jnp.ones((L, d), dtype),
        "ln2_bias": jnp.zeros((L, d), dtype),
        "fc1_w": nrm(keys[4], (L, d, ff), d**-0.5),
        "fc1_b": jnp.zeros((L, ff), dtype),
        "fc2_w": nrm(keys[5], (L, ff, d), ff**-0.5),
        "fc2_b": jnp.zeros((L, d), dtype),
    }
    params = {
        "patch_w": nrm(keys[6], (patch_dim, d), patch_dim**-0.5),
        "pos_embed": nrm(keys[7], (cfg.num_patches + (cfg.arch == "clip"), d), 0.02),
        "layers": layers,
    }
    if cfg.arch == "clip":
        # CLIP: no patch-conv bias; class token + pre-layernorm instead
        key, sub = jax.random.split(key)
        params["cls_embed"] = nrm(sub, (d,), d**-0.5)
        params["pre_ln_scale"] = jnp.ones((d,), dtype)
        params["pre_ln_bias"] = jnp.zeros((d,), dtype)
    else:
        params["patch_b"] = jnp.zeros((d,), dtype)
    return params


def patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, 3] -> [B, (H/p)*(W/p), 3*p*p] with (c, i, j) channel order
    matching the HF conv weight layout [O, C, KH, KW]."""
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    # VALID-conv semantics: trailing pixels beyond a full patch are dropped
    # (384 = 27*14 + 6 for SigLIP-so400m-384)
    x = images[:, : gh * patch, : gw * patch, :]
    x = x.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, gh, gw, C, p, p]
    return x.reshape(b, gh * gw, c * patch * patch)


def _encoder_layer(x, lp, num_heads, eps, hidden_act, use_flash=False):
    from vidi_tpu.ops.pallas import fused_tower_layer as ftl
    if ftl.use_fused(lp):
        # int8 towers: LN/quantize/rescale epilogues fused around the int8
        # MXU dots (the jnp dynamic_qdense form leaves them VPU-serialized)
        q, k, v = ftl.ln_qkv(x, lp, eps)
        attn = mha(q, k, v, num_heads, use_flash=use_flash)
        x = ftl.o_residual(attn, x, lp)
        return ftl.ln_ffn(x, lp, eps, hidden_act)
    res = x
    h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], eps)
    q = dense(h, lp["q_w"], lp["q_b"])
    k = dense(h, lp["k_w"], lp["k_b"])
    v = dense(h, lp["v_w"], lp["v_b"])
    h = dense(mha(q, k, v, num_heads, use_flash=use_flash), lp["o_w"], lp["o_b"])
    x = res + h
    res = x
    h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], eps)
    h = dense(tower_act(dense(h, lp["fc1_w"], lp["fc1_b"]), hidden_act),
              lp["fc2_w"], lp["fc2_b"])
    return res + h


def forward_features(params: Params, images: jnp.ndarray, cfg: VisionConfig,
                     remat: bool = False, use_flash: bool = False) -> jnp.ndarray:
    """images [B, H, W, 3] (processor-normalized) -> patch features [B, N, D]
    tapped at `cfg.select_layer` (default -2: all but the last layer)."""
    images = images.astype(params["patch_w"].dtype)
    x = dense(patchify(images, cfg.patch_size), params["patch_w"],
              params.get("patch_b"))
    if cfg.arch == "clip":
        cls = jnp.broadcast_to(params["cls_embed"].astype(x.dtype),
                               (x.shape[0], 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)
    if cfg.arch == "clip":
        x = layer_norm(x, params["pre_ln_scale"], params["pre_ln_bias"],
                       cfg.layer_norm_eps)

    n_run = cfg.num_layers + 1 + cfg.select_layer if cfg.select_layer < 0 else cfg.select_layer
    layers = jax.tree.map(lambda a: a[:n_run], params["layers"])

    def body(h, lp):
        return _encoder_layer(h, lp, cfg.num_heads, cfg.layer_norm_eps,
                              cfg.hidden_act, use_flash), None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, layers)
    if cfg.arch == "clip":
        x = x[:, 1:]  # drop class token (clip.py:23-25 keeps patches only)
    return x
