"""vidi_tpu param pytree -> HF-format checkpoint export.

The exact inverse of `infer/convert.py`: unstacks the [L, ...] scan layers,
transposes matmul weights back to torch's [out, in], and writes
`model.safetensors` + `config.json` so a finetuned model can be handed back
to the reference ecosystem (the reference saves HF-compatible weights after
training — Vidi1.5_9B/vidi/train/train.py:92-106, with ZeRO-3's 16-bit
gather on save, scripts/zero3.json:29) and reloaded here via
`load_model(model_path=...)`.

Quantized (int8/int4) leaves are dequantized before export — HF checkpoints
carry plain tensors.
"""
from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

from vidi_tpu.core.config import DattnConfig, TextConfig

Array = np.ndarray


def _np(x, dtype=None) -> Array:
    from vidi_tpu.infer.quantize import (
        QUANT4_KEY, QUANT_KEY, dequantize_weight, dequantize_weight4,
        is_quantized)
    import jax.numpy as jnp

    if is_quantized(x):
        # int8 covers both layouts (per-column weights and per-row
        # embeddings — scale broadcasting is the same multiply)
        deq = dequantize_weight4 if QUANT4_KEY in x else dequantize_weight
        x = deq(x, jnp.float32)
    a = np.asarray(x)
    return a.astype(dtype) if dtype is not None else a


def _unstack(sd: Dict[str, Array], stacked, fmt: str, transpose: bool = False):
    """[L, ...] -> sd[fmt.format(i)] per layer (transposing matmul weights
    back to torch [out, in])."""
    arr = _np(stacked)
    for i in range(arr.shape[0]):
        a = arr[i]
        sd[fmt.format(i)] = a.T if transpose else a


def export_text(params: Dict, cfg: TextConfig, prefix: str = "model.") -> Dict[str, Array]:
    sd: Dict[str, Array] = {}
    lp = params["layers"]
    sd[prefix + "embed_tokens.weight"] = _np(params["embed"])
    sd[prefix + "norm.weight"] = _np(params["final_ln"])
    _unstack(sd, lp["input_ln"], prefix + "layers.{}.input_layernorm.weight")
    _unstack(sd, lp["post_attn_ln"],
             prefix + "layers.{}.post_attention_layernorm.weight")
    _unstack(sd, lp["q_w"], prefix + "layers.{}.self_attn.q_proj.weight", True)
    _unstack(sd, lp["k_w"], prefix + "layers.{}.self_attn.k_proj.weight", True)
    _unstack(sd, lp["v_w"], prefix + "layers.{}.self_attn.v_proj.weight", True)
    _unstack(sd, lp["o_w"], prefix + "layers.{}.self_attn.o_proj.weight", True)
    _unstack(sd, lp["gate_w"], prefix + "layers.{}.mlp.gate_proj.weight", True)
    _unstack(sd, lp["up_w"], prefix + "layers.{}.mlp.up_proj.weight", True)
    _unstack(sd, lp["down_w"], prefix + "layers.{}.mlp.down_proj.weight", True)
    if cfg.double_norms:
        _unstack(sd, lp["pre_ffn_ln"],
                 prefix + "layers.{}.pre_feedforward_layernorm.weight")
        _unstack(sd, lp["post_ffn_ln"],
                 prefix + "layers.{}.post_feedforward_layernorm.weight")
    if not cfg.tie_word_embeddings:
        sd["lm_head.weight"] = _np(params["lm_head"]).T
    return sd


def _export_encoder_layers(sd, layers, prefix, names):
    """Shared ViT/Whisper encoder layer unstacking. `names` maps our key ->
    HF submodule path (None -> key absent, e.g. whisper's bias-free k_proj)."""
    for ours, theirs in names.items():
        if theirs is None or ours not in layers:
            continue
        transpose = ours.endswith("_w")
        _unstack(sd, layers[ours], prefix + "layers.{}." + theirs, transpose)


_VIT_LAYER_NAMES = {
    "ln1_scale": "layer_norm1.weight", "ln1_bias": "layer_norm1.bias",
    "q_w": "self_attn.q_proj.weight", "q_b": "self_attn.q_proj.bias",
    "k_w": "self_attn.k_proj.weight", "k_b": "self_attn.k_proj.bias",
    "v_w": "self_attn.v_proj.weight", "v_b": "self_attn.v_proj.bias",
    "o_w": "self_attn.out_proj.weight", "o_b": "self_attn.out_proj.bias",
    "ln2_scale": "layer_norm2.weight", "ln2_bias": "layer_norm2.bias",
    "fc1_w": "mlp.fc1.weight", "fc1_b": "mlp.fc1.bias",
    "fc2_w": "mlp.fc2.weight", "fc2_b": "mlp.fc2.bias",
}

_WHISPER_LAYER_NAMES = {
    "ln1_scale": "self_attn_layer_norm.weight",
    "ln1_bias": "self_attn_layer_norm.bias",
    "q_w": "self_attn.q_proj.weight", "q_b": "self_attn.q_proj.bias",
    "k_w": "self_attn.k_proj.weight",  # no k bias in whisper
    "v_w": "self_attn.v_proj.weight", "v_b": "self_attn.v_proj.bias",
    "o_w": "self_attn.out_proj.weight", "o_b": "self_attn.out_proj.bias",
    "ln2_scale": "final_layer_norm.weight", "ln2_bias": "final_layer_norm.bias",
    "fc1_w": "fc1.weight", "fc1_b": "fc1.bias",
    "fc2_w": "fc2.weight", "fc2_b": "fc2.bias",
}


def export_vision(params: Dict, cfg, prefix: str) -> Dict[str, Array]:
    sd: Dict[str, Array] = {}
    pw = _np(params["patch_w"])  # [C*KH*KW, O] -> [O, C, KH, KW]
    sd[prefix + "embeddings.patch_embedding.weight"] = pw.T.reshape(
        pw.shape[1], 3, cfg.patch_size, cfg.patch_size)
    if "patch_b" in params:
        sd[prefix + "embeddings.patch_embedding.bias"] = _np(params["patch_b"])
    sd[prefix + "embeddings.position_embedding.weight"] = _np(params["pos_embed"])
    if cfg.arch == "clip":
        sd[prefix + "embeddings.class_embedding"] = _np(params["cls_embed"])
        sd[prefix + "pre_layrnorm.weight"] = _np(params["pre_ln_scale"])
        sd[prefix + "pre_layrnorm.bias"] = _np(params["pre_ln_bias"])
    _export_encoder_layers(sd, params["layers"], prefix + "encoder.",
                           _VIT_LAYER_NAMES)
    return sd


def export_whisper(params: Dict, prefix: str) -> Dict[str, Array]:
    sd: Dict[str, Array] = {}
    for ours, theirs in (("conv1_w", "conv1.weight"), ("conv1_b", "conv1.bias"),
                         ("conv2_w", "conv2.weight"), ("conv2_b", "conv2.bias"),
                         ("pos_embed", "embed_positions.weight"),
                         ("final_ln_scale", "layer_norm.weight"),
                         ("final_ln_bias", "layer_norm.bias")):
        sd[prefix + theirs] = _np(params[ours])
    _export_encoder_layers(sd, params["layers"], prefix, _WHISPER_LAYER_NAMES)
    return sd


def export_mm_adapters(params: Dict, cfg: DattnConfig,
                       prefix: str = "model.") -> Dict[str, Array]:
    sd: Dict[str, Array] = {}

    def proj(name, tree):
        sd[f"{prefix}{name}.model.0.weight"] = _np(tree["w0"]).T
        sd[f"{prefix}{name}.model.0.bias"] = _np(tree["b0"])
        sd[f"{prefix}{name}.model.2.weight"] = _np(tree["w1"]).T
        sd[f"{prefix}{name}.model.2.bias"] = _np(tree["b1"])

    def pos(name, tree):
        sd[f"{prefix}{name}.mlp.0.weight"] = _np(tree["w0"]).T
        sd[f"{prefix}{name}.mlp.0.bias"] = _np(tree["b0"])
        sd[f"{prefix}{name}.mlp.2.weight"] = _np(tree["w1"]).T
        sd[f"{prefix}{name}.mlp.2.bias"] = _np(tree["b1"])

    sd[prefix + "mm_rand_llm_norm.weight"] = _np(params["llm_norm"]["weight"])
    if cfg.mm_input_type == "image":
        proj("mm_rand_projector", params["projector"])
        sd[prefix + "mm_rand_norm.weight"] = _np(params["norm"]["weight"])
        pos("mm_rand_pos_w", params["pos_w"])
        pos("mm_rand_pos_h", params["pos_h"])
        return sd
    proj("mm_rand_img_projector", params["img_projector"])
    sd[prefix + "mm_rand_img_norm.weight"] = _np(params["img_norm"]["weight"])
    pos("mm_rand_pos_w", params["pos_w"])
    pos("mm_rand_pos_h", params["pos_h"])
    pos("mm_rand_pos_t", params["pos_t"])
    sd[prefix + "mm_rand_aud_pool.weight"] = _np(params["aud_pool"]["w"])
    proj("mm_rand_aud_projector", params["aud_projector"])
    sd[prefix + "mm_rand_aud_norm.weight"] = _np(params["aud_norm"]["weight"])
    if cfg.mm_version == "v1":
        sd[prefix + "mm_rand_img_pool.conv.weight"] = _np(params["img_pool"]["w"])
    return sd


def export_state_dict(params: Dict, cfg: DattnConfig) -> Dict[str, Array]:
    """Full Dattn pytree -> flat HF state dict (convert_dattn inverse)."""
    sd = export_text(params["text"], cfg.text)
    sd.update(export_vision(params["vision"], cfg.vision,
                            "model.mm_vis.vision_model."))
    sd.update(export_whisper(params["audio"], "model.mm_aud.encoder."))
    sd.update(export_mm_adapters(params["mm"], cfg))
    return sd


def config_to_hf(cfg: DattnConfig) -> dict:
    """DattnConfig -> config.json dict (config_from_hf inverse; field set
    mirrors DattnGemma2Config defaults, reference gemma.py:427-448)."""
    t = cfg.text
    arch = t.arch
    out = {
        "model_type": "dattn_gemma2" if arch == "gemma2" else "dattn_mistral",
        "architectures": ["DattnGemma2ForCausalLM" if arch == "gemma2"
                          else "DattnMistralForCausalLM"],
        "vocab_size": t.vocab_size,
        "hidden_size": t.hidden_size,
        "num_hidden_layers": t.num_layers,
        "num_attention_heads": t.num_heads,
        "num_key_value_heads": t.num_kv_heads,
        "head_dim": t.head_dim,
        "intermediate_size": t.intermediate_size,
        "rope_theta": t.rope_theta,
        "rms_norm_eps": t.rms_norm_eps,
        "sliding_window": t.sliding_window,
        "tie_word_embeddings": t.tie_word_embeddings,
        "mm_vision_tower": ("openai/clip-vit-large-patch14"
                            if cfg.vision.arch == "clip"
                            else "google/siglip2-so400m-patch14-384"),
        "mm_audio_tower": "openai/whisper-large-v3",
        "mm_image_pool_size": cfg.mm_image_pool_size,
        "mm_audio_pool_size": cfg.mm_audio_pool_size,
        "mm_time_interval": cfg.mm_time_interval,
        "mm_std": cfg.mm_std,
        "mm_input_type": cfg.mm_input_type,
        "mm_image_aspect_ratio": cfg.mm_image_aspect_ratio,
        "loss_thres": cfg.loss_thres,
        "model_max_length": cfg.model_max_length,
        "torch_dtype": "bfloat16",
    }
    if arch == "gemma2":
        out.update({
            "attn_logit_softcapping": t.attn_softcap,
            "final_logit_softcapping": t.final_softcap,
            "query_pre_attn_scalar": round(t.query_scale ** -2),
            "eos_token_id": 107,
        })
    # tower geometry under explicit keys: HF configs reference towers by hub
    # name only, which can't describe e.g. a tiny test model. config_from_hf
    # honors these when present; real Vidi checkpoints lack them and fall
    # back to the name-based mapping.
    v, a = cfg.vision, cfg.audio
    out["vidi_tpu_vision"] = {
        "arch": v.arch, "hidden_size": v.hidden_size,
        "num_layers": v.num_layers, "num_heads": v.num_heads,
        "intermediate_size": v.intermediate_size, "patch_size": v.patch_size,
        "image_size": v.image_size, "layer_norm_eps": v.layer_norm_eps,
        "hidden_act": v.hidden_act, "select_layer": v.select_layer,
    }
    out["vidi_tpu_audio"] = {
        "d_model": a.d_model, "num_layers": a.num_layers,
        "num_heads": a.num_heads, "ffn_dim": a.ffn_dim,
        "num_mel_bins": a.num_mel_bins,
        "max_source_positions": a.max_source_positions,
    }
    out["vidi_tpu_text"] = {
        "embed_scale": t.embed_scale, "hidden_act": t.hidden_act,
        "double_norms": t.double_norms, "query_scale": t.query_scale,
        "mm_version": cfg.mm_version,
    }
    return out


def save_pretrained(params: Dict, cfg: DattnConfig, out_dir: str,
                    tokenizer_src: str | None = None) -> str:
    """Write model.safetensors + config.json (+ tokenizer files copied from
    `tokenizer_src` when given). Returns out_dir."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    sd = export_state_dict(params, cfg)
    # transposed views are non-contiguous; safetensors serializes the raw
    # buffer, so materialize the transpose
    sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
    save_file(sd, os.path.join(out_dir, "model.safetensors"))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config_to_hf(cfg), f, indent=2)
    if tokenizer_src is not None and os.path.isdir(tokenizer_src):
        import shutil
        for name in ("tokenizer.json", "tokenizer.model",
                     "tokenizer_config.json", "special_tokens_map.json"):
            src = os.path.join(tokenizer_src, name)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(out_dir, name))
    return out_dir
