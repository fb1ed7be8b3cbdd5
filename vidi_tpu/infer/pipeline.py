"""End-to-end temporal-retrieval inference pipeline + CLI.

Mirrors the reference driver (reference: Vidi1.5_9B/vidi/eval/inference.py):
decode video -> preprocess frames/audio -> build the TR prompt -> greedy
generate -> parse normalized `a.aaa-b.bbb` time ranges -> scale by duration ->
"HH:MM:SS-HH:MM:SS" spans.

    python -m vidi_tpu.infer.pipeline --video-path v.mp4 --query "a red car" \
        [--model-path DIR | --random-weights tiny]
"""
from __future__ import annotations

import argparse
import re
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from vidi_tpu.constants import DEFAULT_IMAGE_TOKEN, GEMMA_EOS_TOKEN_ID, IMAGE_TOKEN_INDEX
from vidi_tpu.core.config import DattnConfig
from vidi_tpu.infer.generate import generate
from vidi_tpu.media.audio import process_audio
from vidi_tpu.media.images import resize_frames_uint8
from vidi_tpu.media.text import preprocess_chat, tokenizer_image_token
from vidi_tpu.media.video import get_media_length, load_audio, load_video
from vidi_tpu.models import dattn
from vidi_tpu.models.adapters import budget_hw

TIME_RANGE_RE = re.compile(r"(\d\.\d+)-(\d\.\d+)")  # inference.py:55
TR_PROMPT = "During which time segments in the video can we see {}?"  # :34
# Vidi_7B variants (Vidi_7B/inference.py:34,54): looser number regex, and the
# prompt asks for percentage ranges with the video length stated.
TIME_RANGE_RE_V1 = re.compile(r"([\d|\.]+)-([\d|\.]+)")
TR_PROMPT_V1 = ("Given the frames from a video, answer the time range in "
                "percentage that corresponds to query text split by comma. "
                "Video length is: {:.2f} and text query is: {}.")


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def pick_eos(cfg: "DattnConfig", tokenizer) -> int:
    """Generation stop id: gemma2 stops at <end_of_turn>=107 (the reference
    sets eos_token_id=107, gemma.py:461-462); mistral at </s>."""
    if cfg.text.arch == "gemma2":
        eos = GEMMA_EOS_TOKEN_ID
    else:
        eos = tokenizer.eos_token_id
    if getattr(tokenizer, "vocab_size", 1 << 30) <= eos:
        eos = tokenizer.eos_token_id
    return eos


def format_spans(ranges: List[Tuple[float, float]], length: float,
                 mm_version: str = "v1.5") -> str:
    """Normalized (t0, t1) pairs -> 'HH:MM:SS-HH:MM:SS, ...' (inference.py:57-66).
    The 7B prints seconds with two decimals (Vidi_7B/inference.py:59-63)."""
    out = []
    for r0, r1 in ranges:
        t0, t1 = r0 * length, r1 * length
        if mm_version == "v1":
            out.append(
                "{:02d}:{:02d}:{:.2f}-{:02d}:{:02d}:{:.2f}".format(
                    int(t0 / 3600), (int(t0) % 3600) // 60, int(t0) % 60,
                    int(t1 / 3600), (int(t1) % 3600) // 60, int(t1) % 60))
        else:
            out.append(
                "{:02d}:{:02d}:{:02d}-{:02d}:{:02d}:{:02d}".format(
                    int(t0 / 3600), (int(t0) % 3600) // 60, int(t0) % 60,
                    int(t1 / 3600), (int(t1) % 3600) // 60, int(t1) % 60))
    return ", ".join(out)


def parse_time_ranges(text: str, mm_version: str = "v1.5") -> List[Tuple[float, float]]:
    pattern = TIME_RANGE_RE_V1 if mm_version == "v1" else TIME_RANGE_RE
    pairs = []
    for a, b in pattern.findall(text):
        try:
            pairs.append((float(a), float(b)))
        except ValueError:  # the loose v1 regex can match e.g. '..'
            continue
    return pairs


def encode_media_streaming(params, cfg: DattnConfig, vid_path: str, *,
                           fps: float = 1.0, chunk_frames: int = 112,
                           mm_chunks: int = 32, use_flash: bool = False,
                           device_resize: bool = False):
    """Streaming encode_media: decode -> preprocess -> transfer -> tower
    per chunk, with JAX async dispatch overlapping the device encode of
    chunk i with the host decode of chunk i+1 (the reference decodes the
    whole video before any GPU work, vid_utils.py:10-24 then
    multimodal.py:156-208). Numerics match encode_media: the per-frame
    pipeline is chunk-local either way.

    Frames ship uint8 (1/4 the float32 bytes); rescale/normalize runs on
    device inside `frame_tokens_chunk`. `device_resize=True` ships the raw
    decode-resolution frames and runs the bicubic resize on device too —
    zero per-frame host python, for hosts where CPU (not the link) binds."""
    from vidi_tpu.media.video import probe, stream_video, _frame_indices

    duration, avg_fps, n_frames, _, _ = probe(vid_path)
    n = len(_frame_indices(n_frames, avg_fps, fps, None))
    hw = budget_hw(n, cfg.mm_image_pool_size, cfg.vision.num_patches_per_side,
                   cfg.mm_max_tokens_base)

    # audio decodes on its own thread CONCURRENTLY with the frame-decode
    # loop (its own libav handle on the same file; ctypes/ffmpeg calls drop
    # the GIL) — previously it only started after every frame chunk was
    # dispatched, serializing ~0.5-1 s of host work behind the frame loop
    import threading

    audio_out = {}

    def _decode_audio():
        try:
            wave = load_audio(vid_path, cfg.audio.sampling_rate)
            audio_out["mels"] = process_audio(wave, cfg.audio)
        except BaseException as e:  # noqa: BLE001 — re-raised on join
            audio_out["err"] = e

    audio_thread = threading.Thread(target=_decode_audio, daemon=True)
    audio_thread.start()

    toks = []
    for chunk in stream_video(vid_path, fps=fps, chunk=chunk_frames):
        pixels = (np.ascontiguousarray(chunk) if device_resize
                  else resize_frames_uint8(chunk, cfg.vision.image_size))
        toks.append(dattn.frame_tokens_chunk(
            params, jnp.asarray(pixels), cfg=cfg, hw=hw, use_flash=use_flash))
    audio_thread.join()
    if "err" in audio_out:
        raise audio_out["err"]
    mels, audio_len = audio_out["mels"]

    tok = jnp.concatenate(toks, axis=0)[None]  # [1, N, h2, w2, d]
    img, img_mask = dattn.finish_video_tokens_jit(
        params, cfg, tok, jnp.asarray([n], jnp.int32))
    aud, aud_mask = dattn.encode_video_audios(
        params, cfg, jnp.asarray(mels)[None],
        jnp.asarray([audio_len], jnp.int32), mm_chunks=mm_chunks,
        use_flash=use_flash)
    return img, img_mask, aud, aud_mask


def encode_media(params, cfg: DattnConfig, vid_path: str, *, fps: float = 1.0,
                 mm_chunks: int = 32, use_flash: bool = False,
                 stream_chunk: int = 0, device_resize: bool = False):
    """Video file -> (img, img_mask, aud, aud_mask) device features.
    `stream_chunk > 0` switches to the overlapped streaming path. Frames
    ship uint8; normalize (and, with `device_resize`, the bicubic resize)
    runs on device — see encode_media_streaming."""
    if stream_chunk > 0:
        return encode_media_streaming(params, cfg, vid_path, fps=fps,
                                      chunk_frames=stream_chunk,
                                      mm_chunks=mm_chunks,
                                      use_flash=use_flash,
                                      device_resize=device_resize)
    # device_resize would stage EVERY raw decode-resolution frame on device
    # at once here (an hour of 1080p = ~22 GB > HBM); the streaming path
    # keeps it chunk-local, so the flag requires --stream-chunk
    assert not device_resize, (
        "--device-resize needs --stream-chunk N (the batch path would stage "
        "all raw-resolution frames on device at once)")
    return encode_media_arrays(
        params, cfg, *decode_media_host(vid_path, cfg, fps=fps),
        mm_chunks=mm_chunks, use_flash=use_flash)


def decode_media_host(vid_path: str, cfg: DattnConfig, *, fps: float = 1.0):
    """Host half of the batch encode path: decode + resize + mel. Pure
    numpy — safe to run on a prefetch thread while the device works
    (run_benchmark overlaps the next video's decode this way)."""
    frames = load_video(vid_path, fps=fps)
    pixels = resize_frames_uint8(frames, cfg.vision.image_size)
    wave = load_audio(vid_path, cfg.audio.sampling_rate)
    mels, audio_len = process_audio(wave, cfg.audio)
    return pixels, mels, audio_len


def encode_media_arrays(params, cfg: DattnConfig, pixels, mels, audio_len, *,
                        mm_chunks: int = 32, use_flash: bool = False):
    """Device half: uint8 frames + mel features -> modality streams."""
    n = pixels.shape[0]
    hw = budget_hw(n, cfg.mm_image_pool_size, cfg.vision.num_patches_per_side,
                   cfg.mm_max_tokens_base)
    img, img_mask = dattn.encode_video_images(
        params, cfg, jnp.asarray(pixels)[None], jnp.asarray([n], jnp.int32), hw,
        mm_chunks=mm_chunks, use_flash=use_flash)
    aud, aud_mask = dattn.encode_video_audios(
        params, cfg, jnp.asarray(mels)[None], jnp.asarray([audio_len], jnp.int32),
        mm_chunks=mm_chunks, use_flash=use_flash)
    return img, img_mask, aud, aud_mask


def build_prompt_ids(question: str, tokenizer, mm_version: str = "v1.5",
                     length: float = 0.0, task: str = "tr",
                     options=None) -> np.ndarray:
    from vidi_tpu.infer.tasks import build_task_prompt

    qs = DEFAULT_IMAGE_TOKEN + "\n" + build_task_prompt(
        task, question, mm_version=mm_version, length=length, options=options)
    arch = "mistral" if mm_version == "v1" else "gemma2"
    prompt = preprocess_chat([{"from": "human", "value": qs}], tokenizer,
                             arch=arch)
    ids = tokenizer_image_token(prompt, tokenizer, IMAGE_TOKEN_INDEX)
    # Dattn splices the <image> token OUT of the text stream entirely
    # (multimodal.py:377-397) — video reaches the model via cross-attention.
    return np.asarray([t for t in ids if t != IMAGE_TOKEN_INDEX], np.int32)


def build_prompt_batch(ids_list, pad_to: int = 64):
    """Right-pad a list of token-id sequences to a shared 64-bucketed length
    -> (prompt [Q, T] int32, mask [Q, T] bool)."""
    t = _round_up(max(len(i) for i in ids_list), pad_to)
    prompt = np.zeros((len(ids_list), t), np.int32)
    mask = np.zeros((len(ids_list), t), bool)
    for r, ids in enumerate(ids_list):
        prompt[r, : len(ids)] = ids
        mask[r, : len(ids)] = True
    return prompt, mask


def ask(question: str, vid_path: str, params, cfg: DattnConfig, tokenizer, *,
        task: str = "tr", fps: float = 1.0, max_new_tokens: int = 1024,
        mm_chunks: int = 32, eos_id: Optional[int] = None, pad_to: int = 64,
        use_flash: Optional[bool] = None, quantize_caches: bool = False,
        stream_chunk: int = 0, device_resize: bool = False,
        stop_keywords: tuple = (), temperature: float = 0.0,
        top_k: int = 0, top_p: float = 1.0, seed: int = 0,
        num_beams: int = 1, draft=None, spec_k: int = 4) -> str:
    import jax
    if use_flash is None:  # flash kernels only lower on real TPU backends
        use_flash = jax.default_backend() not in ("cpu",)
    length = get_media_length(vid_path)
    img, img_mask, aud, aud_mask = encode_media(
        params, cfg, vid_path, fps=fps, mm_chunks=mm_chunks,
        use_flash=use_flash, stream_chunk=stream_chunk,
        device_resize=device_resize)

    ids = build_prompt_ids(question, tokenizer, cfg.mm_version, length, task)
    prompt, mask = build_prompt_batch([ids], pad_to)

    eos = eos_id if eos_id is not None else pick_eos(cfg, tokenizer)
    # device-side keyword stop (token-suffix compare of the reference's
    # KeywordsStoppingCriteria) + host-side text truncation below
    from vidi_tpu.infer.generate import tokenize_stop_keywords
    stops = tokenize_stop_keywords(stop_keywords, tokenizer)
    if draft is not None and num_beams > 1:
        import sys
        print("warning: speculative decoding does not compose with beam "
              "search; the draft is IGNORED with --num-beams>1",
              file=sys.stderr)
    if draft is not None and num_beams == 1:
        # speculative decoding: at temperature 0 the output is IDENTICAL to
        # greedy generate(); with temperature>0 the rejection-sampling rule
        # keeps the output DISTRIBUTION exactly sampled generate()'s — the
        # draft only moves throughput either way (test_speculative). Keyword
        # stops stay host-side (like beams): a committed window can overshoot
        # a keyword by <= spec_k tokens, which truncate_at_keywords removes.
        from vidi_tpu.infer.generate import speculative_generate
        # draft == "ngram": model-free prompt-lookup drafting
        draft_params, draft_cfg = (None, None) if draft == "ngram" else draft
        result = speculative_generate(
            params, cfg, draft_params, draft_cfg,
            jnp.asarray(prompt), jnp.asarray(mask),
            img=img, img_mask=img_mask, aud=aud, aud_mask=aud_mask,
            max_new_tokens=max_new_tokens, eos_id=eos, spec_k=spec_k,
            mm_chunks=mm_chunks, use_flash=use_flash,
            quantize_caches=quantize_caches,
            temperature=temperature, top_k=top_k, top_p=top_p,
            rng=jax.random.PRNGKey(seed) if temperature > 0 else None)
        import sys
        drafted = max(int(result.n_drafted.sum()), 1)
        print(f"speculative: {int(result.n_target_steps)} target passes, "
              f"accept {int(result.n_accepted.sum())}/{drafted} "
              f"({int(result.n_accepted.sum()) / drafted:.0%})",
              file=sys.stderr)
    elif num_beams > 1:
        # beam decode has no in-loop keyword stop (a stopped beam would need
        # per-beam freezing); stop keywords still truncate host-side below,
        # matching the reference's text-level behavior
        from vidi_tpu.infer.generate import beam_generate
        result = beam_generate(
            params, cfg, jnp.asarray(prompt), jnp.asarray(mask),
            img=img, img_mask=img_mask, aud=aud, aud_mask=aud_mask,
            max_new_tokens=max_new_tokens, eos_id=eos, mm_chunks=mm_chunks,
            use_flash=use_flash, quantize_caches=quantize_caches,
            num_beams=num_beams)
    else:
        result = generate(
            params, cfg, jnp.asarray(prompt), jnp.asarray(mask),
            img=img, img_mask=img_mask, aud=aud, aud_mask=aud_mask,
            max_new_tokens=max_new_tokens, eos_id=eos, mm_chunks=mm_chunks,
            use_flash=use_flash, quantize_caches=quantize_caches,
            stop_sequences=stops, temperature=temperature, top_k=top_k,
            top_p=top_p,
            rng=jax.random.PRNGKey(seed) if temperature > 0 else None)

    n = int(result.lengths[0])
    text = tokenizer.decode(np.asarray(result.tokens[0, :n]),
                            skip_special_tokens=True).strip()
    if stop_keywords:
        from vidi_tpu.media.text import truncate_at_keywords
        text = truncate_at_keywords(text, stop_keywords).strip()
    return parse_task_output(text, task, length, cfg.mm_version)


def parse_task_output(text: str, task: str, length: float,
                      mm_version: str = "v1.5") -> str:
    """Decoded model text -> the task's display/eval string (the per-task
    parse+format tail of `ask`, shared with the serving daemon)."""
    if task == "tr":
        return format_spans(parse_time_ranges(text, mm_version), length,
                            mm_version)
    if task == "chapter":
        from vidi_tpu.infer.tasks import parse_chapters
        chs = parse_chapters(text, length, mm_version)
        return "\n".join(f"{c['start']:.1f}-{c['end']:.1f}s {c['title']}"
                         for c in chs)
    if task == "highlight":
        from vidi_tpu.infer.tasks import parse_highlights
        return ", ".join(f"{a:.1f}-{b:.1f}s"
                         for a, b in parse_highlights(text, length,
                                                      mm_version))
    if task == "mcq":
        from vidi_tpu.infer.tasks import parse_mcq
        return parse_mcq(text)
    if task == "character":
        import json as _json

        from vidi_tpu.infer.tasks import parse_character
        return _json.dumps(parse_character(text, length))
    return text  # qa / stg: raw model text (stg rows via run_benchmark)


def main():
    from vidi_tpu.core.compile_cache import setup_compile_cache
    setup_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--video-path", type=str, required=True)
    p.add_argument("--query", type=str, required=True)
    p.add_argument("--task", type=str, default="tr",
                   choices=["tr", "stg", "chapter", "highlight", "qa", "mcq",
                            "character"])
    p.add_argument("--model-path", type=str, default=None)
    p.add_argument("--random-weights", type=str, default=None,
                   help="tiny|9b|7b: run with random weights (plumbing check)")
    p.add_argument("--fps", type=float, default=1.0)
    p.add_argument("--max-new-tokens", type=int, default=1024)
    p.add_argument("--mm-splits", type=int, default=32)
    p.add_argument("--load-8bit", action="store_true",
                   help="int8 weight-only decoder (builder.py:30-39 analog)")
    p.add_argument("--load-4bit", action="store_true",
                   help="group-wise int4 weight-only decoder (bnb nf4 "
                        "load_4bit analog, builder.py:32-39; ~5 GB less HBM "
                        "than int8 on the 9B)")
    p.add_argument("--load-8bit-towers", action="store_true",
                   help="int8 encoder towers with dynamic activation scales "
                        "(2x MXU rate on the FLOP-bound encode)")
    p.add_argument("--quantize-kv", action="store_true",
                   help="int8 modality KV caches (halves cache HBM)")
    p.add_argument("--dtype", choices=["bfloat16", "float32"],
                   default="bfloat16",
                   help="model compute dtype (float32 for CPU runs — the "
                        "CPU backend has no bf16 dot kernels)")
    p.add_argument("--w8a8-prefill", type=int, default=None, metavar="MIN_TOKENS",
                   help="with --load-8bit: dynamic int8 activations for decoder "
                        "matmuls with >= MIN_TOKENS tokens (prefill modality "
                        "stream on the MXU int8 path; decode stays weight-only)")
    p.add_argument("--device-resize", action="store_true",
                   help="ship raw decode-resolution uint8 frames and run the "
                        "bicubic resize on device (zero per-frame host "
                        "python; default does host PIL resize + device "
                        "normalize). Requires --stream-chunk so raw frames "
                        "stay chunk-local on device")
    p.add_argument("--stream-chunk", type=int, default=0, metavar="FRAMES",
                   help="overlap host decode with device encode in FRAMES-"
                        "frame chunks (0 = decode the whole video first)")
    p.add_argument("--seq-parallel", type=int, default=1, metavar="N",
                   help="multi-chip: shard the modality streams + KV caches "
                        "N-ways over a seq mesh axis (the >single-chip-HBM "
                        "long-video/9B configuration; params FSDP-shard over "
                        "the whole mesh)")
    p.add_argument("--model-parallel", type=int, default=1, metavar="N",
                   help="multi-chip: tensor-parallel decoder over a model "
                        "mesh axis")
    p.add_argument("--temperature", type=float, default=0.0,
                   help="0 = greedy (the reference drivers' do_sample=False "
                        "default); >0 samples inside the jitted decode loop "
                        "(HF GenerationMixin surface, gemma.py:603-655)")
    p.add_argument("--top-k", type=int, default=0,
                   help="with --temperature: keep only the k best logits")
    p.add_argument("--top-p", type=float, default=1.0,
                   help="with --temperature: nucleus sampling mass")
    p.add_argument("--seed", type=int, default=0,
                   help="sampling PRNG seed (runs are reproducible)")
    p.add_argument("--num-beams", type=int, default=1,
                   help=">1: static beam search (HF num_beams surface); the "
                        "modality caches stay shared batch-1 across beams")
    p.add_argument("--draft-model-path", type=str, default=None,
                   help="small text-only HF checkpoint for greedy "
                        "speculative decoding (same tokenizer/vocab as the "
                        "target; output identical to plain greedy)")
    p.add_argument("--draft-random-weights", type=str, default=None,
                   help="tiny|9b|7b: random draft weights (plumbing check)")
    p.add_argument("--spec-k", type=int, default=4,
                   help="speculative window: draft tokens verified per "
                        "target forward")
    p.add_argument("--spec-ngram", action="store_true",
                   help="model-free speculative decoding: draft from 2-gram "
                        "continuation matches in prompt+generated history "
                        "(prompt lookup decoding); no draft checkpoint needed")
    args = p.parse_args()

    from vidi_tpu.infer.loader import load_model

    if args.w8a8_prefill is not None:
        from vidi_tpu.infer import quantize
        quantize.w8a8_min_tokens = args.w8a8_prefill

    import contextlib

    mesh = None
    if args.seq_parallel > 1 or args.model_parallel > 1:
        import jax
        from vidi_tpu.core.mesh import make_mesh
        # single-video inference is batch-1: pin data=1 and use exactly
        # seq*model devices (a leftover data axis under B=1 only produces
        # degenerate shardings and SPMD replicate-repartition fallbacks)
        n = args.seq_parallel * args.model_parallel
        devs = jax.devices()
        assert len(devs) >= n, (f"need {n} devices for seq={args.seq_parallel}"
                                f" x model={args.model_parallel}, have {len(devs)}")
        if len(devs) > n:
            print(f"using {n} of {len(devs)} devices (seq x model)")
        mesh = make_mesh(devs[:n], data=1, seq=args.seq_parallel,
                         model=args.model_parallel)

    # mesh passes INTO the loader: leaves land directly in their sharded
    # layout, so a model bigger than one chip's HBM never stages whole
    params, cfg, tokenizer = load_model(args.model_path, args.random_weights,
                                        dtype=getattr(jnp, args.dtype),
                                        load_8bit=args.load_8bit,
                                        load_8bit_towers=args.load_8bit_towers,
                                        load_4bit=args.load_4bit, mesh=mesh)

    if mesh is not None:
        from vidi_tpu.parallel import sharding
        ctx = sharding.use_mesh(mesh)
    else:
        ctx = contextlib.nullcontext()
    draft = "ngram" if args.spec_ngram else None
    if args.draft_model_path or args.draft_random_weights:
        d_params, d_cfg, _ = load_model(
            args.draft_model_path, args.draft_random_weights,
            dtype=getattr(jnp, args.dtype), load_8bit=args.load_8bit,
            mesh=mesh)
        draft = (d_params, d_cfg)

    with ctx:
        out = ask(args.query, args.video_path, params, cfg, tokenizer,
                  task=args.task, fps=args.fps,
                  max_new_tokens=args.max_new_tokens, mm_chunks=args.mm_splits,
                  quantize_caches=args.quantize_kv,
                  stream_chunk=args.stream_chunk,
                  device_resize=args.device_resize,
                  temperature=args.temperature, top_k=args.top_k,
                  top_p=args.top_p, seed=args.seed,
                  num_beams=args.num_beams, draft=draft, spec_k=args.spec_k)
    print(out if out else "(no parsed output)")


if __name__ == "__main__":
    main()
