"""Model loading: HF-format Vidi checkpoints or random-weight test models.

Replaces the reference's load_pretrained_model
(reference: Vidi1.5_9B/vidi/model/builder.py:24-64). A checkpoint directory is
expected to hold HF `config.json` + safetensors shards (the released Vidi1.5
format); weights are converted once into our stacked pytree layout.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vidi_tpu.core.config import AudioConfig, DattnConfig, TextConfig, VisionConfig
from vidi_tpu.infer.convert import convert_dattn
from vidi_tpu.media.text import ByteTokenizer
from vidi_tpu.models import dattn


def config_from_hf(cfg_json: dict) -> DattnConfig:
    """Map a DattnGemma2Config/DattnMistral config.json onto DattnConfig."""
    arch = "gemma2" if "gemma" in cfg_json.get("model_type", "gemma2") else "mistral"
    if arch == "gemma2":
        text = TextConfig(
            arch="gemma2",
            vocab_size=cfg_json.get("vocab_size", 256000),
            hidden_size=cfg_json.get("hidden_size", 3584),
            num_layers=cfg_json.get("num_hidden_layers", 42),
            num_heads=cfg_json.get("num_attention_heads", 16),
            num_kv_heads=cfg_json.get("num_key_value_heads", 8),
            head_dim=cfg_json.get("head_dim", 256),
            intermediate_size=cfg_json.get("intermediate_size", 14336),
            rope_theta=cfg_json.get("rope_theta", 10000.0),
            rms_norm_eps=cfg_json.get("rms_norm_eps", 1e-6),
            sliding_window=cfg_json.get("sliding_window", 4096),
            attn_softcap=cfg_json.get("attn_logit_softcapping", 50.0),
            final_softcap=cfg_json.get("final_logit_softcapping", 30.0),
            query_scale=cfg_json.get("query_pre_attn_scalar", 256) ** -0.5,
        )
    else:
        base = TextConfig.mistral_7b()
        import dataclasses
        text = dataclasses.replace(
            base,
            vocab_size=cfg_json.get("vocab_size", base.vocab_size),
            hidden_size=cfg_json.get("hidden_size", base.hidden_size),
            num_layers=cfg_json.get("num_hidden_layers", base.num_layers),
            num_heads=cfg_json.get("num_attention_heads", base.num_heads),
            num_kv_heads=cfg_json.get("num_key_value_heads", base.num_kv_heads),
            head_dim=cfg_json.get("head_dim", base.head_dim),
            intermediate_size=cfg_json.get("intermediate_size", base.intermediate_size),
            rope_theta=cfg_json.get("rope_theta", base.rope_theta),
            rms_norm_eps=cfg_json.get("rms_norm_eps", base.rms_norm_eps),
            sliding_window=cfg_json.get("sliding_window", base.sliding_window),
        )
    mm_version = "v1.5" if arch == "gemma2" else "v1"
    # exported-by-us checkpoints carry explicit geometry (infer/export.py);
    # real Vidi checkpoints name towers by hub id only
    if "vidi_tpu_text" in cfg_json:
        import dataclasses
        tt = cfg_json["vidi_tpu_text"]
        mm_version = tt.get("mm_version", mm_version)
        text = dataclasses.replace(
            text, embed_scale=tt["embed_scale"], hidden_act=tt["hidden_act"],
            double_norms=tt["double_norms"], query_scale=tt["query_scale"],
            tie_word_embeddings=cfg_json.get(
                "tie_word_embeddings", text.tie_word_embeddings))
    if "vidi_tpu_vision" in cfg_json:
        vision = VisionConfig(**cfg_json["vidi_tpu_vision"])
    else:
        vision_name = cfg_json.get("mm_vision_tower", "") or ""
        if "clip" in vision_name.lower() or (arch == "mistral" and not vision_name):
            vision = VisionConfig.clip_vit_l14()
        else:
            vision = VisionConfig.siglip2_so400m()
    audio = (AudioConfig(**cfg_json["vidi_tpu_audio"])
             if "vidi_tpu_audio" in cfg_json
             else AudioConfig.whisper_large_v3())
    default_pool = 2 if mm_version == "v1.5" else 8
    return DattnConfig(
        text=text,
        vision=vision,
        audio=audio,
        mm_version=mm_version,
        mm_image_pool_size=cfg_json.get("mm_image_pool_size", default_pool)
        or default_pool,
        mm_audio_pool_size=cfg_json.get("mm_audio_pool_size", 5) or 5,
        mm_time_interval=cfg_json.get("mm_time_interval", 1024) or 1024,
        mm_std=cfg_json.get("mm_std"),
        mm_input_type=cfg_json.get("mm_input_type", "video"),
        mm_image_aspect_ratio=cfg_json.get("mm_image_aspect_ratio", "resize"),
        loss_thres=cfg_json.get("loss_thres"),
        model_max_length=cfg_json.get("model_max_length", 4096),
    )


def vision_config_from_hf(cfg_json: dict) -> VisionConfig:
    """HF SiglipVisionConfig / CLIPVisionConfig (possibly nested under
    "vision_config" in a combined model config) -> VisionConfig."""
    if "vision_config" in cfg_json:
        model_type = cfg_json.get("model_type", "")
        cfg_json = dict(cfg_json["vision_config"])
        cfg_json.setdefault("model_type", model_type)
    arch = "clip" if "clip" in cfg_json.get("model_type", "") else "siglip"
    base = (VisionConfig.clip_vit_l14() if arch == "clip"
            else VisionConfig.siglip2_so400m())
    act = {"gelu_pytorch_tanh": "gelu_tanh", "quick_gelu": "quick_gelu",
           "gelu_tanh": "gelu_tanh"}.get(
        cfg_json.get("hidden_act", base.hidden_act), base.hidden_act)
    return VisionConfig(
        arch=arch,
        hidden_size=cfg_json.get("hidden_size", base.hidden_size),
        num_layers=cfg_json.get("num_hidden_layers", base.num_layers),
        num_heads=cfg_json.get("num_attention_heads", base.num_heads),
        intermediate_size=cfg_json.get("intermediate_size",
                                       base.intermediate_size),
        patch_size=cfg_json.get("patch_size", base.patch_size),
        image_size=cfg_json.get("image_size", base.image_size),
        layer_norm_eps=cfg_json.get("layer_norm_eps", base.layer_norm_eps),
        hidden_act=act,
    )


def audio_config_from_hf(cfg_json: dict) -> AudioConfig:
    """HF WhisperConfig -> AudioConfig (encoder-only fields)."""
    base = AudioConfig.whisper_large_v3()
    return AudioConfig(
        d_model=cfg_json.get("d_model", base.d_model),
        num_layers=cfg_json.get("encoder_layers", base.num_layers),
        num_heads=cfg_json.get("encoder_attention_heads", base.num_heads),
        ffn_dim=cfg_json.get("encoder_ffn_dim", base.ffn_dim),
        num_mel_bins=cfg_json.get("num_mel_bins", base.num_mel_bins),
        max_source_positions=cfg_json.get("max_source_positions",
                                          base.max_source_positions),
    )


def _detect_prefix(sd: dict, candidates, probe: str) -> str:
    """First prefix under which `probe` (a key every valid checkpoint of
    this module has) exists — a wrong-layout dir fails here with the key
    sample, not deep inside the converter."""
    for p in candidates:
        if p + probe in sd:
            return p
    raise KeyError(f"no prefix in {candidates} has '{probe}'; "
                   f"sample keys: {sorted(sd)[:5]}")


def assemble_model(model_path: str, mm_vision_tower: str,
                   mm_audio_tower: Optional[str], *, dtype=jnp.bfloat16,
                   seed: int = 0, mm_overrides: Optional[dict] = None):
    """Assemble a fresh Vidi from separate HF checkpoints — the reference's
    finetune entry (train.py:122-141): decoder weights from a plain
    Gemma2/Mistral checkpoint at `model_path`, towers from their own
    checkpoint dirs (multimodal.py:44-57 `from_pretrained` of
    mm_vision_tower / mm_audio_tower), and the mm_rand_* adapters freshly
    initialized (`_keys_to_ignore_on_load_missing`, gemma.py:469) with
    llm_norm scaled at mm_std (multimodal.py:63).

    `mm_audio_tower=None` leaves the audio tower randomly initialized (only
    valid when the run never feeds audio, e.g. mm_input_type="image").
    Returns (params, cfg) with params on host.
    """
    import dataclasses

    from vidi_tpu.infer.convert import (
        convert_clip, convert_siglip, convert_text, convert_whisper)

    with open(os.path.join(model_path, "config.json")) as f:
        base_json = json.load(f)
    cfg = config_from_hf(base_json)
    if "mm_time_interval" not in base_json:
        # assembly default is the reference ModelArguments' 10000
        # (train.py:51), not the released-checkpoint fallback
        cfg = dataclasses.replace(cfg, mm_time_interval=10000)
    with open(os.path.join(mm_vision_tower, "config.json")) as f:
        vision = vision_config_from_hf(json.load(f))
    if mm_audio_tower is not None:
        with open(os.path.join(mm_audio_tower, "config.json")) as f:
            audio = audio_config_from_hf(json.load(f))
    else:
        # no audio tower (image-type assembly): a tiny stub instead of a
        # never-fed random whisper-large (~1.3 GB it would otherwise cost
        # in HBM, checkpoints, and host->device transfer)
        audio = AudioConfig.tiny()
    overrides = dict(mm_overrides or {})
    # drop Nones so dataclass defaults (reference config-class attributes)
    # survive unset CLI flags
    overrides = {k: v for k, v in overrides.items() if v is not None}
    cfg = dataclasses.replace(cfg, vision=vision, audio=audio, **overrides)

    text_sd = load_safetensors_dir(model_path)
    text = convert_text(text_sd, cfg.text, dtype,
                        prefix=_detect_prefix(text_sd, ("model.", ""),
                                              "embed_tokens.weight"))
    vis_sd = load_safetensors_dir(mm_vision_tower)
    conv_vis = convert_clip if vision.arch == "clip" else convert_siglip
    vis = conv_vis(vis_sd, vision, dtype, prefix=_detect_prefix(
        vis_sd, ("vision_model.", "vision_tower.vision_model.",
                 "model.vision_model.", ""),
        "encoder.layers.0.layer_norm1.weight"))
    if mm_audio_tower is not None:
        aud_sd = load_safetensors_dir(mm_audio_tower)
        aud = convert_whisper(aud_sd, audio, dtype, prefix=_detect_prefix(
            aud_sd, ("model.encoder.", "encoder.", ""), "conv1.weight"))
    else:
        from vidi_tpu.models import whisper
        aud = whisper.init_params(jax.random.PRNGKey(seed + 1), audio, dtype)
    params = {
        "text": text, "vision": vis, "audio": aud,
        "mm": dattn.init_mm_params(jax.random.PRNGKey(seed), cfg, dtype),
    }
    return params, cfg


def load_safetensors_dir(path: str) -> dict:
    from safetensors import safe_open

    sd = {}
    shards = sorted(
        f for f in os.listdir(path) if f.endswith(".safetensors"))
    for shard in shards:
        with safe_open(os.path.join(path, shard), framework="np") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
    if not sd:
        raise FileNotFoundError(f"no safetensors shards in {path}")
    return sd


def _place(params, mesh):
    """Host tree -> device: sharded per-leaf when a mesh is given (one
    transfer, never staged whole on one chip), else onto device 0."""
    if mesh is not None:
        from vidi_tpu.parallel import sharding
        return sharding.shard_params(params, mesh)
    if jax.default_backend() != "cpu":
        return jax.device_put(params, jax.devices()[0])
    return params


def load_model(
    model_path: Optional[str] = None,
    random_weights: Optional[str] = None,
    dtype=jnp.bfloat16,
    seed: int = 0,
    load_8bit: bool = False,
    load_8bit_towers: bool = False,
    load_4bit: bool = False,
    mesh=None,
    mm_vision_tower: Optional[str] = None,
    mm_audio_tower: Optional[str] = None,
    mm_overrides: Optional[dict] = None,
) -> Tuple[dict, DattnConfig, object]:
    """-> (params, cfg, tokenizer).

    `mm_vision_tower`: assemble a fresh Vidi instead of loading a full
    checkpoint — `model_path` is then a plain Gemma2/Mistral HF checkpoint,
    the towers load from their own dirs, and mm_rand_* adapters initialize
    fresh (`mm_overrides` carries the reference train.py model-args:
    mm_std, mm_image_pool_size, mm_input_type, ...). Reference
    train.py:122-141 + multimodal.py:44-57.

    `mesh`: place each converted leaf DIRECTLY into its sharded layout
    (parallel/sharding.py specs) — the full tree never stages on one chip,
    which matters exactly when a mesh is the point (a bf16 9B exceeds one
    chip's HBM) and avoids a second full transfer.

    `random_weights` in {"tiny", "tiny7b", "9b", "7b", "1.5b"} builds an
    un-trained
    model with a ByteTokenizer — plumbing verification without released
    weights. `load_8bit` quantizes the text-decoder layer weights to int8
    (the reference's bitsandbytes option, builder.py:30-39);
    `load_8bit_towers` additionally quantizes the encoder towers with dynamic
    activation scales so their matmuls run int8 on the MXU at 2x bf16 rate
    (bnb load_in_8bit quantizes every nn.Linear, towers included);
    `load_4bit` packs the text-decoder matmuls to group-wise int4 instead
    (the reference's bnb nf4 load_4bit, builder.py:32-39 — ~5 GB less HBM
    than int8 on the 9B)."""
    import dataclasses

    def _override(cfg):
        # mm_* model-args override the config in every branch, as the
        # reference's from_pretrained(**model_args) does (train.py:122-141)
        ov = {k: v for k, v in (mm_overrides or {}).items() if v is not None}
        return dataclasses.replace(cfg, **ov) if ov else cfg

    if random_weights is not None:
        assert mm_vision_tower is None, (
            "--mm_vision_tower assembles from a base LLM checkpoint; it "
            "cannot combine with random weights (--tiny/--random-weights)")
        if random_weights == "tiny":
            cfg = DattnConfig.tiny()
        elif random_weights == "tiny7b":
            cfg = DattnConfig.tiny("mistral")
        elif random_weights == "9b":
            cfg = DattnConfig.vidi15_9b()
        elif random_weights == "7b":
            cfg = DattnConfig.vidi_7b()
        elif random_weights == "1.5b":
            cfg = DattnConfig.bench_1_5b()
        else:
            raise ValueError(random_weights)
        cfg = _override(cfg)
        tok = ByteTokenizer()
        # clamp vocab so ByteTokenizer ids stay in range for tiny configs
        if load_8bit or load_8bit_towers or load_4bit:
            # init + quantize on host so the full-precision tree never
            # touches device HBM (the 9B bf16 exceeds one chip)
            cpu = jax.local_devices(backend="cpu")[0]
            with jax.default_device(cpu):
                params = dattn.init_params(jax.random.PRNGKey(seed), cfg, dtype)
                from vidi_tpu.infer.quantize import quantize_params
                modules = ("text",) * (load_8bit or load_4bit) + ("vision", "audio") * load_8bit_towers
                params = quantize_params(params, modules=modules,
                                         bits=4 if load_4bit else 8)
            params = _place(params, mesh)
        else:
            params = dattn.init_params(jax.random.PRNGKey(seed), cfg, dtype)
            if mesh is not None:
                params = _place(params, mesh)
        return params, cfg, tok

    assert model_path is not None, "need --model-path or --random-weights"
    # Convert (and quantize) ON HOST: the bf16 9B is ~18 GB — it must never
    # materialize on a 16 GB chip before quantization shrinks it.
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        # x5 retry on weight load (flaky storage / hub), builder.py:46-57
        num_try, max_try = 0, 5
        while True:
            try:
                if mm_vision_tower is not None:
                    params, cfg = assemble_model(
                        model_path, mm_vision_tower, mm_audio_tower,
                        dtype=dtype, seed=seed, mm_overrides=mm_overrides)
                else:
                    with open(os.path.join(model_path, "config.json")) as f:
                        cfg = _override(config_from_hf(json.load(f)))
                    sd = load_safetensors_dir(model_path)
                    params = convert_dattn(sd, cfg, dtype)
                break
            except (FileNotFoundError, KeyError, AssertionError):
                # deterministic layout/conversion failures — retrying only
                # re-reads whole checkpoints from disk x5 for the same error
                raise
            except Exception as e:  # noqa: BLE001 — mirrors the reference retry
                print(repr(e))
                num_try += 1
                if num_try == max_try:
                    raise
        if load_8bit or load_8bit_towers or load_4bit:
            from vidi_tpu.infer.quantize import quantize_params
            modules = ("text",) * (load_8bit or load_4bit) + ("vision", "audio") * load_8bit_towers
            params = quantize_params(params, modules=modules,
                                     bits=4 if load_4bit else 8)
    params = _place(params, mesh)
    if not any(os.path.exists(os.path.join(model_path, n))
               for n in ("tokenizer.json", "tokenizer.model",
                         "tokenizer_config.json")):
        # exported-from-training dirs (infer/export.py) may carry weights
        # only; fall back to the byte tokenizer so the model stays loadable
        print(f"no tokenizer files in {model_path}; using ByteTokenizer")
        return params, cfg, ByteTokenizer()
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(
        model_path, model_max_length=cfg.model_max_length, padding_side="right")
    return params, cfg, tok
