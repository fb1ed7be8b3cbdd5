"""Benchmark: hour-long-video temporal-retrieval throughput per chip.

Measures the full TR compute path — device-side frame preprocessing (uint8
frames ship from host per chunk, normalize fuses into the tower), SigLIP
tower, pooling/projection, Dattn prefill (text self-attn + cross-attn over the
video/audio streams + diagonal updates), and greedy decode — on synthetic
media, and reports video-seconds processed per wall-second per chip.

Frames stage on device as uint8 (half the old bf16 bytes) and the per-frame
pipeline — normalize -> tower -> pool -> project — runs fused inside
mm_chunks-sized lax.map chunks, so peak activation memory stays chunk-local:
a 2-hour video (BENCH_VIDEO_SECONDS=7200) runs on one chip (the old bench
staged bf16 frames and OOM'd). Real-video host decode/transfer overlap is
measured separately via `pipeline.encode_media_streaming` (CLAUDE.md).

Resilience (round-2 outage lesson): the default invocation is a WRAPPER that
(a) probes the backend in a fresh subprocess with bounded retry/backoff (a
transient axon-tunnel failure no longer erases the round's perf record), then
(b) runs the headline config plus each variant in its own subprocess (memory
and failure isolation; all share the persistent compile cache), and (c) prints
ONE combined json line:

  {"metric", "value", "unit", "vs_baseline", "mfu", "mfu_bf16_peak",
   "decode_tok_s", "model", "video_seconds", "variants": {
      "int8":  {... "mfu_int8_peak": ...},   # int8 towers + weight-only
                                             # decoder + W8A8 prefill
      "int8kv": {...},                       # + int8 modality KV caches
      "9b":    {...},                        # flagship single-chip envelope
      "2h":    {...},                        # 7200-s chunked media path
      "train": {...}}}                       # train-step throughput

Headline value/unit/vs_baseline stay the 1.5b bf16 hour-long number, so the
driver's single-line parse and the BENCH_PREV comparison are unchanged.

Inner modes (env; the wrapper sets these per variant — BENCH_INNER=1 runs one
config directly):
  BENCH_MODE=train                  — train-step throughput (bench_train)
  BENCH_MODEL=1.5b (default) | 9b   — 9b = flagship Vidi1.5-9B geometry in
    the verified single-chip envelope (int8 weights + int8 KV + W8A8
    prefill routing); weights are random-initialized directly on device in
    quantized form (bf16 9B exceeds HBM, and host->device transfer of a
    real tree is minutes over this link).
  BENCH_QUANT=  (1.5b only) "int8" = int8 towers + weight-only int8 decoder
    + W8A8 prefill routing; "int8kv" adds int8 modality KV caches.
  BENCH_VIDEO_SECONDS (3600), BENCH_DECODE_TOKENS (32), BENCH_MM_SPLITS (32),
  BENCH_STREAM_CHUNK (120).
  BENCH_MODE=serve                  — grouped same-video serving throughput
    (shared media_prefill caches vs per-query full prefill; bench_serve)
Wrapper knobs: BENCH_VARIANTS overrides the variant order verbatim (set ""
  to skip variants; "4h" = 14400-s clip with int8 KV, opt-in only — measured
  988.5 video_s/s on chip but needs ~25 min wall, outside the default
  budget). The DEFAULT order is SELF-AUDITING: the wrapper scans the
  committed BENCH_r0*.json driver records for variants whose parsed tail
  already carries a captured value and runs the never-captured ones FIRST
  (round-4 lesson: the driver killed the run while re-measuring variants it
  had already recorded — int8kv/9b landed, train/serve never started). The
  driver's outer timeout can kill the wrapper at any point and every
  COMPLETED variant must already be on stdout, so the combined
  headline+variants-so-far line is re-printed, flushed, after EVERY variant.
  BENCH_PROBE_TIMEOUT_S (600), BENCH_VARIANT_TIMEOUT_S (1200),
  BENCH_VARIANT_BUDGET_S (1800, measured from headline completion — r04
  proved the driver window holds headline + ~600 s of variants before the
  kill; sizing to 1800 s costs nothing thanks to the per-variant flush but
  avoids STARTING a long variant that cannot finish), BENCH_TOTAL_BUDGET_S
  (3300 overall cap; round-3 lesson: rc=124 with a 5400 s budget lost every
  variant).

MFU accounting is self-describing: "mfu_bf16_peak" = analytic model FLOPs /
wall / (194 TFLOP/s * chips), the measured bf16 matmul peak of this v5e chip.
int8 configs ALSO emit "mfu_int8_peak" (÷ the measured 399 TOP/s int8 peak) —
their FLOPs run mostly on int8 MXU passes, so dividing by the bf16 peak alone
would flatter them. "mfu" stays = mfu_bf16_peak for BENCH_PREV continuity.
"decode_tok_s" = (decode_tokens-1) / (full wall - prefill-only wall), so
decode-path regressions aren't hidden under the prefill-dominated headline.
"""
import json
import os
import subprocess
import sys
import time

BF16_PEAK = 194e12  # measured chained-dependency matmul peak on this chip
INT8_PEAK = 399e12  # measured int8 matmul peak (TOP/s)


# --------------------------------------------------------------------------
# Inner bench (one config per process; BENCH_INNER=1)
# --------------------------------------------------------------------------

def _jax_setup():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/vidi_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def bench_config():
    """~1.5B-scale Dattn with the 9B's structure (fits one v5e chip in
    bf16); shared with `--random-weights 1.5b` serving."""
    from vidi_tpu.core.config import DattnConfig
    return DattnConfig.bench_1_5b()


def bench_flops(cfg, n_frames: int, n_windows: int, hw,
                text_len: int, decode_tokens: int) -> float:
    """Analytic model FLOPs for one bench run (2*M*N*K per matmul; attention
    scores/AV included; norms/elementwise/embeds ignored, <1%)."""
    v, a, t = cfg.vision, cfg.audio, cfg.text
    # hw is the pre-pool feature-map size; space_to_depth(pool) merges it
    pool = cfg.mm_image_pool_size
    h2w2 = (hw[0] // pool) * (hw[1] // pool)

    # vision tower per frame
    tv = v.num_patches_per_side ** 2
    fl_v = 2 * tv * v.hidden_size * 3 * v.patch_size ** 2  # patch conv
    fl_v += v.num_layers * (8 * tv * v.hidden_size ** 2
                            + 4 * tv ** 2 * v.hidden_size
                            + 4 * tv * v.hidden_size * v.intermediate_size)
    fl_v += 2 * h2w2 * (v.hidden_size * pool ** 2 * t.hidden_size
                        + t.hidden_size ** 2)
    fl_v *= n_frames

    # audio tower per 30-s window
    ta = a.max_source_positions  # 1500
    fl_a = 2 * a.nb_max_frames * a.d_model * a.num_mel_bins * 3  # conv1
    fl_a += 2 * ta * a.d_model * a.d_model * 3                   # conv2 (s=2)
    fl_a += a.num_layers * (8 * ta * a.d_model ** 2
                            + 4 * ta ** 2 * a.d_model
                            + 4 * ta * a.d_model * a.ffn_dim)
    aud_tok = ta // cfg.mm_audio_pool_size
    fl_a += 2 * aud_tok * (a.d_model * t.hidden_size + t.hidden_size ** 2)
    fl_a *= n_windows

    # decoder prefill: modality streams dominate (k/v proj feed both the
    # cross-attn caches and the diagonal update; FFN runs on every stream
    # token every layer — dattn.py layer step (3))
    s_mm = n_frames * h2w2 + n_windows * aud_tok
    d, f = t.hidden_size, t.intermediate_size
    h_dh = t.num_heads * t.head_dim
    hk_dh = t.num_kv_heads * t.head_dim
    per_layer = (2 * s_mm * d * hk_dh * 2          # stream k,v proj
                 + 2 * s_mm * h_dh * d             # diagonal o_proj
                 + 6 * s_mm * d * f                # stream FFN (gate/up/down)
                 + 2 * text_len * d * (h_dh + 2 * hk_dh) + 2 * text_len * h_dh * d
                 + 4 * text_len * s_mm * h_dh      # T2V+T2A scores+AV
                 + 4 * text_len ** 2 * h_dh        # T2T
                 + 6 * text_len * d * f)
    fl_d = t.num_layers * per_layer + 2 * d * t.vocab_size

    # greedy decode
    per_step = t.num_layers * (
        2 * d * (h_dh + 2 * hk_dh) + 2 * h_dh * d + 6 * d * f
        + 4 * (s_mm + text_len + decode_tokens) * h_dh) + 2 * d * t.vocab_size
    fl_d += decode_tokens * per_step

    return float(fl_v + fl_a + fl_d)


def _random_quantized_9b(cfg, seed: int = 0):
    """Random 9B params in the verified int8 envelope, initialized directly
    ON DEVICE leaf-by-leaf: the bf16 tree (18.5 GB) never exists, and
    nothing crosses the slow host link."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from vidi_tpu.infer import quantize
    from vidi_tpu.models import dattn

    shapes = jax.eval_shape(
        lambda k: quantize.quantize_params(
            dattn.init_params(k, cfg, jnp.bfloat16),
            ("text", "vision", "audio"), quantize_embed=True),
        jax.random.PRNGKey(seed))
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    key = jax.random.PRNGKey(seed)

    def fill(k, shape, dtype):
        if jnp.issubdtype(dtype, jnp.integer):
            return jax.random.randint(k, shape, -100, 100, jnp.int32).astype(dtype)
        return (jax.random.normal(k, shape, jnp.float32) * 0.02 + 0.05).astype(dtype)

    def init_leaf(k, shape, dtype):
        # random generators materialize fp32/int32 temps at the FULL leaf
        # size (8.6 GB for the stacked 9B down_w) — big leaves fill
        # slice-by-slice under one jit so only a [1, ...] temp exists
        if len(shape) >= 2 and int(np.prod(shape)) * 4 > 1 << 30:
            def body(i, buf):
                sub = fill(jax.random.fold_in(k, i), shape[1:], dtype)
                return jax.lax.dynamic_update_index_in_dim(buf, sub, i, 0)
            return jax.jit(lambda kk: jax.lax.fori_loop(
                0, shape[0], body, jnp.zeros(shape, dtype)))(k)
        return fill(k, shape, dtype)

    out = []
    for i, leaf in enumerate(leaves):
        k = jax.random.fold_in(key, i)
        out.append(init_leaf(k, leaf.shape, leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def bench_train():
    """BENCH_MODE=train: full train-step throughput (video-seconds trained
    per wall-second per chip) at the documented bench-scale recipe — 64-frame
    video sample, t=128 text, remat, flash kernels, mm_chunks=4, towers
    frozen (reference train.py:155-159 default). MFU counts tower forward
    once + 3x the trainable decoder/adapters (fwd + 2x bwd)."""
    jax = _jax_setup()
    import jax.numpy as jnp
    from vidi_tpu.models import dattn
    from vidi_tpu.train import data as data_mod
    from vidi_tpu.train.optimizer import TrainHParams, make_optimizer
    from vidi_tpu.train.train_step import make_batch_hw, opt_init, train_step

    cfg = bench_config()
    n_frames = int(os.environ.get("BENCH_TRAIN_FRAMES", 64))
    t_len = 128
    n_windows = max(n_frames // 30, 1)
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    hp = TrainHParams(total_steps=100)
    tx = make_optimizer(params, hp)
    opt_state = opt_init(tx, params)
    batch = data_mod.synthetic_batch(cfg, b=1, t=t_len, n_frames=n_frames,
                                     n_windows=n_windows)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    hw = make_batch_hw(cfg, n_frames)
    rng = jax.random.PRNGKey(1)

    use_flash = jax.default_backend() != "cpu"  # CPU smoke: no Pallas
    # measured on chip 2026-08-19 (with use_flash reaching the towers):
    # full-remat 0.5387 s/step, "dots" policy remat 0.5258 (save matmul
    # outputs across the backward scan, recompute only elementwise), "none"
    # OOMs (28.5 G needed). dots is the recommended bench-scale config.
    remat = {"full": True, "dots": "dots", "none": False}[
        os.environ.get("BENCH_TRAIN_REMAT", "dots")]

    def step(params, opt_state, i):
        return train_step(params, opt_state, batch, jax.random.fold_in(rng, i),
                          cfg=cfg, tx=tx, hw=hw, mm_chunks=4, remat=remat,
                          use_flash=use_flash, frozen=("vision", "audio"))

    params, opt_state, loss = step(params, opt_state, 0)  # compile
    float(jax.device_get(loss))
    times = []
    for i in range(1, 4):
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, i)
        float(jax.device_get(loss))  # sync (tunnel: device_get, not block)
        times.append(time.perf_counter() - t0)
    t = min(times)

    # FLOPs: frozen towers forward once; decoder+adapters fwd + 2x bwd.
    inf = bench_flops(cfg, n_frames, n_windows, hw, t_len, 0)
    v, a = cfg.vision, cfg.audio
    tv = v.num_patches_per_side ** 2
    fl_tower = n_frames * v.num_layers * (
        8 * tv * v.hidden_size ** 2 + 4 * tv ** 2 * v.hidden_size
        + 4 * tv * v.hidden_size * v.intermediate_size)
    ta = a.max_source_positions
    fl_tower += n_windows * a.num_layers * (
        8 * ta * a.d_model ** 2 + 4 * ta ** 2 * a.d_model
        + 4 * ta * a.d_model * a.ffn_dim)
    flops = fl_tower + 3 * (inf - fl_tower)
    n_chips = jax.device_count()
    mfu = round(flops / t / (BF16_PEAK * n_chips), 4)
    print(json.dumps({
        "metric": "train_video_throughput",
        "value": round(n_frames / t / n_chips, 3),
        "unit": "video_s/s/chip",
        "vs_baseline": 1.0,
        "mfu": mfu,
        "mfu_bf16_peak": mfu,
        "model": "1.5b-train",
        "step_time_s": round(t, 4),
    }))


def bench_inner():
    jax = _jax_setup()
    import numpy as np
    import jax.numpy as jnp
    from vidi_tpu.core.config import DattnConfig
    from vidi_tpu.infer.generate import generate
    from vidi_tpu.models import dattn
    from vidi_tpu.models.adapters import budget_hw

    model = os.environ.get("BENCH_MODEL", "1.5b")
    # 9B default = the VERIFIED single-chip envelope (64-frame clip, int8 +
    # int8 KV): at 196 img tokens/frame its int8 caches cost ~0.17 MB/token
    # x 42 layers, so ~14k stream tokens is what fits beside 11.8 GB of
    # int8 params — hour-long 9B needs the seq mesh (parallel/).
    video_seconds = int(os.environ.get("BENCH_VIDEO_SECONDS",
                                       60 if model == "9b" else 3600))
    mm_chunks = int(os.environ.get("BENCH_MM_SPLITS", 32))  # reference inference.py:86
    decode_tokens = int(os.environ.get("BENCH_DECODE_TOKENS", 32))
    stream_chunk = int(os.environ.get("BENCH_STREAM_CHUNK", 120))
    bench_quant = os.environ.get("BENCH_QUANT", "")
    # the prefill-only rerun that isolates decode time costs one extra
    # compile; BENCH_DECODE_SPLIT=0 skips it
    decode_split = os.environ.get("BENCH_DECODE_SPLIT", "1") == "1"

    from vidi_tpu.infer import quantize
    if model == "9b":
        cfg = DattnConfig.vidi15_9b()
        params = _random_quantized_9b(cfg)
        quantize.w8a8_min_tokens = 256
        quant_caches = True
        gen_chunks = 8  # the verified 9B envelope uses mm_splits=8 prefill
    else:
        cfg = bench_config()
        params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
        if bench_quant.startswith("int8"):
            # Opt-in quantized configurations (NOT the default/recorded
            # metric): the CLI's --load-8bit --load-8bit-towers
            # --w8a8-prefill 256 combination; "int8kv" adds --quantize-kv.
            params = quantize.quantize_params(params, ("text", "vision", "audio"))
            quantize.w8a8_min_tokens = 256
        quant_caches = bench_quant == "int8kv"
        # prefill unchunked is fastest at 1-hour scale; beyond, the stream
        # FFN intermediates (~2.2 GB per tensor at 180k tokens) must be
        # mm_splits-chunked to fit beside the KV caches; at 4 h (360k img
        # tokens, int8kv) the transients must shrink further or HBM
        # fragmentation (~6 GB at gen_chunks=8) kills the fit
        gen_chunks = int(os.environ.get(
            "BENCH_GEN_SPLITS",
            1 if video_seconds <= 3600 else (8 if video_seconds <= 7200
                                             else 32)))

    n_frames = video_seconds  # 1 fps, the reference default
    n_windows = max(video_seconds // 30, 1)
    rng = np.random.default_rng(0)
    # uint8 frames pre-staged on device (1/2 the old bf16 staging bytes):
    # the timed loop measures device throughput. Real-video host
    # decode/transfer overlap is the streaming pipeline's job
    # (pipeline.encode_media_streaming; measured wall-clock in CLAUDE.md —
    # the dev-tunnel link here is ~50 MB/s and would swamp a
    # device-throughput metric). Device-side normalize runs inside the
    # per-frame pipeline either way (dtype dispatch in dattn._frame_tokens).
    # Beyond an hour the full frame array wouldn't fit next to the KV
    # caches, so the bench switches to the streaming compute path: a small
    # pool of device-resident uint8 chunks cycled through
    # frame_tokens_chunk, exactly like encode_media_streaming — raw frames
    # never fully materialize (measured ~1% slower than the fused graph).
    chunked = os.environ.get("BENCH_CHUNKED") == "1" or n_frames > 3600
    size = cfg.vision.image_size
    if chunked:
        base_chunk = rng.integers(0, 256, (stream_chunk, size, size, 3),
                                  np.uint8)
        n_chunks = (n_frames + stream_chunk - 1) // stream_chunk
        last = n_frames - stream_chunk * (n_chunks - 1)
        chunk_pool = [jax.device_put(base_chunk) for _ in range(min(n_chunks, 4))]
        last_chunk = jax.device_put(base_chunk[:last])
    else:
        frames = jax.device_put(rng.integers(
            0, 256, (1, n_frames, size, size, 3), np.uint8))
    mels = jnp.asarray(
        rng.standard_normal((1, n_windows, 128, 3000)), jnp.bfloat16)
    hw = budget_hw(n_frames, cfg.mm_image_pool_size,
                   cfg.vision.num_patches_per_side, cfg.mm_max_tokens_base)
    prompt = jnp.asarray(rng.integers(3, cfg.text.vocab_size, (1, 64)), jnp.int32)
    pmask = jnp.ones((1, 64), bool)

    @jax.jit
    def encode_batch(params, frames, mels):
        # per-frame pipeline (uint8 -> normalize -> tower -> pool -> project)
        # is fused inside mm_chunks-sized lax.map chunks, so peak activation
        # memory is chunk-local while the whole encode stays one XLA graph.
        # Towers use the single-block Pallas tower_attention kernel (3-4x
        # XLA's fused softmax at this shape).
        img, im = dattn.encode_video_images(
            params, cfg, frames, jnp.asarray([n_frames], jnp.int32), hw,
            mm_chunks=max(mm_chunks, n_frames // stream_chunk), use_flash=True)
        aud, am = dattn.encode_video_audios(
            params, cfg, mels, jnp.asarray([n_windows * 3000], jnp.int32),
            use_flash=True)
        return img, im, aud, am

    def encode_chunked():
        toks = [dattn.frame_tokens_chunk(
                    params, chunk_pool[i % len(chunk_pool)], cfg=cfg, hw=hw,
                    use_flash=True) for i in range(n_chunks - 1)]
        toks.append(dattn.frame_tokens_chunk(params, last_chunk, cfg=cfg,
                                             hw=hw, use_flash=True))
        tok = jnp.concatenate(toks, axis=0)[None]
        img, im = dattn.finish_video_tokens_jit(
            params, cfg, tok, jnp.asarray([n_frames], jnp.int32))
        aud, am = dattn.encode_video_audios(
            params, cfg, mels, jnp.asarray([n_windows * 3000], jnp.int32),
            mm_chunks=mm_chunks, use_flash=True)
        return img, im, aud, am

    # beyond 2 h the whole-generate jit OOMs: first on HBM fragmentation
    # (measured at 4 h/int8kv: 10.4 GB of unpadded temps but 41%
    # fragmentation -> 17.9 GB), and even with the stream prefill split into
    # its own jit, media_prefill's layer-major scan carries the full 600k-
    # token stream (~3.7 GB double-buffered) next to the 8.7 GB caches.
    # media_prefill_chunked flips the loop order — chunk-major, layers
    # inner (legal: the Dattn stream is per-token) — so the caches become
    # jit INPUTS to the text-prefill+decode jit and the prefill peak is
    # caches + one chunk's transients.
    shared_prefill = os.environ.get(
        "BENCH_SHARED_PREFILL", "1" if video_seconds > 7200 else "0") == "1"

    def run(new_tokens=decode_tokens):
        img, im, aud, am = (encode_chunked() if chunked
                            else encode_batch(params, frames, mels))
        if shared_prefill:
            media = dattn.media_prefill_chunked(
                params, cfg, img=img, aud=aud,
                quantize_caches=quant_caches)
            del img, aud
            res = generate(params, cfg, prompt, pmask,
                           img_mask=im, aud_mask=am, media_caches=media,
                           max_new_tokens=new_tokens, eos_id=1,
                           use_flash=True)
        else:
            res = generate(params, cfg, prompt, pmask, img=img, img_mask=im,
                           aud=aud, aud_mask=am, max_new_tokens=new_tokens,
                           eos_id=1, use_flash=True,  # eos never sampled
                           mm_chunks=gen_chunks, quantize_caches=quant_caches)
        # NOTE: on the axon TPU tunnel block_until_ready is a no-op; a
        # device_get transfer is the only real sync (~33 ms RTT).
        return np.asarray(jax.device_get(res.tokens))

    run()  # compile + warmup
    # measure the bare sync round-trip to subtract it out
    inc = jax.jit(lambda a: a + 1)
    tiny = np.asarray(jax.device_get(inc(jnp.zeros((8,), jnp.int32))))
    t0 = time.perf_counter()
    for _ in range(3):
        tiny = np.asarray(jax.device_get(inc(jnp.asarray(tiny))))
    rtt = (time.perf_counter() - t0) / 3

    n_timed = 2 if model == "9b" else 3
    times = []
    for _ in range(n_timed):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    t = max(min(times) - rtt, 1e-6)

    # decode throughput: rerun with max_new_tokens=1 (same encode+prefill,
    # one decode step) — the wall-clock difference is (decode_tokens-1)
    # decode steps. Extra compile, but the prefill subgraphs hit the cache.
    decode_tok_s = None
    if decode_split and decode_tokens > 1:
        run(1)  # compile
        tp = []
        for _ in range(n_timed):
            t0 = time.perf_counter()
            run(1)
            tp.append(time.perf_counter() - t0)
        t_prefill = max(min(tp) - rtt, 1e-6)
        if t > t_prefill:
            decode_tok_s = (decode_tokens - 1) / (t - t_prefill)

    n_chips = jax.device_count()
    value = video_seconds / t / n_chips
    flops = bench_flops(cfg, n_frames, n_windows, hw, 64, decode_tokens)
    mfu = flops / t / (BF16_PEAK * n_chips)

    vs = 1.0
    if os.path.exists("BENCH_PREV.json"):
        try:
            prev = json.load(open("BENCH_PREV.json"))
            if prev.get("value"):
                vs = value / prev["value"]
        except Exception:
            pass
    out = {
        "metric": "hour_long_tr_video_throughput",
        "value": round(value, 3),
        "unit": "video_s/s/chip",
        "vs_baseline": round(vs, 3),
        "mfu": round(mfu, 4),
        "mfu_bf16_peak": round(mfu, 4),
        "model": model,
        "video_seconds": video_seconds,
    }
    if model == "9b" or bench_quant.startswith("int8"):
        # int8 configs run most FLOPs on int8 MXU passes; the honest
        # utilization divides by the int8 peak (399 TOP/s), not bf16's 194
        out["mfu_int8_peak"] = round(flops / t / (INT8_PEAK * n_chips), 4)
    if decode_tok_s is not None:
        out["decode_tok_s"] = round(decode_tok_s, 1)
    print(json.dumps(out))


def bench_spec():
    """BENCH_MODE=spec (opt-in variant "spec"): END-TO-END speculative
    decoding speedup with a REAL distilled draft — closes the loop the
    verify_step microbench only bounded (verify W=2/4/8 all cost 1.00x a
    decode step, scripts/spec_microbench.py).

    Three on-chip stages: (0) short TR-format finetune so the teacher has
    LEARNED low-entropy structure to speculate on (see the stage-0 comment);
    (1) draft distilled from the finetuned teacher's OWN rollouts
    (train/distill.py's design) — crucially in the production asymmetry:
    rollouts + soft targets are conditioned on hour-long media caches
    (text_prefill_with_caches), while the draft is text-only and never sees
    media, exactly like speculative_generate at serving time; (2) acceptance
    + tok/s measured on FRESH prompts (held-out seed).

    The measurement runs SAMPLED (temperature BENCH_SPEC_TEMP, rejection-
    sampling speculative decoding): a random-weight teacher's GREEDY
    continuation collapses into short loops, which ANY echo-ish draft
    matches — measured 2026-08-20 on chip: greedy acceptance 0.981 for the
    distilled AND the untrained random draft alike, i.e. the exact
    fake-acceptance artifact that kept this variant out of the default set.
    Sampling keeps the teacher's output high-entropy, so acceptance is the
    earned quantity min(1, p/q) mass the distillation actually bought —
    reported next to the random-init draft's acceptance as the floor.

    Reports sampled-generate vs sampled-speculative decode tok/s at
    hour-long-KV geometry (90k img + 36k aud bf16 cache tokens), plus the
    plain greedy tok/s as the familiar baseline anchor."""
    jax = _jax_setup()
    import numpy as np
    import jax.numpy as jnp
    from vidi_tpu.infer.generate import generate, speculative_generate
    from vidi_tpu.models import dattn, decoder
    from vidi_tpu.train import distill

    cfg = bench_config()
    tcfg = cfg.text
    use_flash = jax.default_backend() != "cpu"
    teacher = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)

    steps = int(os.environ.get("BENCH_SPEC_STEPS", 240))
    spec_k = int(os.environ.get("BENCH_SPEC_K", 4))
    n_decode = int(os.environ.get("BENCH_SPEC_DECODE_TOKENS", 192))
    # production-style sampling: temperature + nucleus truncation. top_p
    # matters doubly here — it is the realistic serving configuration AND
    # it truncates the imperfectly-trained teacher's 32k-token noise tail
    # (measured: raw temp-0.9 sampling put only 14% of rollout tokens in
    # the learned span alphabet), concentrating the distribution on the
    # learned structure a draft can actually match. The rejection-sampling
    # rule keeps the output distribution exactly the warped target's.
    temp = float(os.environ.get("BENCH_SPEC_TEMP", 0.8))
    top_p = float(os.environ.get("BENCH_SPEC_TOP_P", 0.95))
    batch, p_len, g_len, resample = 8, 32, 64, 8

    # hour-long media caches from a REAL encode (synthetic frames through
    # the towers + adapters + media_prefill, exactly the headline path) —
    # raw-noise K/V caches are off-distribution for the finetuned teacher
    # (trained on tower-encoded media) and scramble its outputs into
    # unlearnable noise: measured acceptance 0.02 distilled / 0.004 random
    # with N(0, 0.1) caches even after the teacher learned its format
    video_seconds = int(os.environ.get("BENCH_SPEC_VIDEO_SECONDS", 3600))
    from vidi_tpu.models.adapters import budget_hw
    nprng = np.random.default_rng(7)
    size = cfg.vision.image_size
    n_windows = max(video_seconds // 30, 1)
    frames = jax.device_put(nprng.integers(
        0, 256, (1, video_seconds, size, size, 3), np.uint8))
    mels = jnp.asarray(nprng.standard_normal(
        (1, n_windows, 128, 3000)), jnp.bfloat16)
    hw = budget_hw(video_seconds, cfg.mm_image_pool_size,
                   cfg.vision.num_patches_per_side, cfg.mm_max_tokens_base)

    @jax.jit
    def encode(teacher, frames, mels):
        img, im = dattn.encode_video_images(
            teacher, cfg, frames, jnp.asarray([video_seconds], jnp.int32),
            hw, mm_chunks=32, use_flash=use_flash)
        aud, am = dattn.encode_video_audios(
            teacher, cfg, mels, jnp.asarray([n_windows * 3000], jnp.int32),
            use_flash=use_flash)
        return img, im, aud, am

    # BENCH_SPEC_QUANT=int8kv: int8 modality caches (the recommended
    # serving config) — speculation composes on top of the fused int8-KV
    # read path, so the two decode accelerations multiply. The finetune
    # still runs on the bf16 caches (the quantized read has no flash-style
    # VJP; its backward materializes a 39.8 GB dense-scores tensor — OOM at
    # compile), then the SAME caches quantize post-hoc for distill +
    # measurement: exactly production's train-bf16 / serve-int8 split.
    spec_quant = os.environ.get("BENCH_SPEC_QUANT", "") == "int8kv"
    img_f, img_mask, aud_f, aud_mask = encode(teacher, frames, mels)
    media = jax.jit(
        lambda t, i, im, a, am: dattn.media_prefill(
            t, cfg, img=i, img_mask=im, aud=a, aud_mask=am,
            use_flash=use_flash))(teacher, img_f, img_mask, aud_f, aud_mask)
    del frames, img_f, aud_f
    s_img = int(img_mask.shape[1])
    s_aud = int(aud_mask.shape[1])

    # --- stage 0: give the teacher LEARNED structure, conditioned EXACTLY
    # as it will serve. A random-weight teacher is unlearnable by any draft
    # (measured both failure modes on chip: greedy rollouts loop and
    # echo-drafts fake 98% acceptance; the sampled distribution is ~uniform
    # 32k-token noise, distilled acceptance 0.012 == random 0.010), and a
    # teacher finetuned under DIFFERENT media conditioning doesn't transfer
    # (measured: loss at the 1.37 task floor with 4-frame training media,
    # yet 0% of hour-cache rollout tokens in the learned alphabet — 90k
    # cache keys dilute cross-attention far outside the training regime).
    # So the finetune runs against the SAME fixed hour-KV caches the
    # rollouts and the measurement read (text_prefill_with_caches is
    # differentiable; the flash path keeps the T2V/T2A VJP tile-local), on
    # TR-format answers: digit ids + '.'/'-'/',' separator roles on a fixed
    # cycle, prompts masked — the low-entropy structure production
    # speculation exploits. adafactor, not Adam: fp32 Adam moments for
    # 1.5B (~12 GB) don't fit beside the caches. The model here is
    # (finetuned decoder + these fixed caches) — self-consistent across
    # finetune, distillation, and measurement.
    t_steps = int(os.environ.get("BENCH_SPEC_TEACHER_STEPS", 900))
    first = last = None
    if t_steps:
        import optax as _optax

        def tr_batch(seed, b=8, tp=32, ta=64):
            rng = np.random.default_rng(seed)
            prompt = rng.integers(3, tcfg.vocab_size, (b, tp))
            roles = np.array([0, 0, 2, 0, 3, 0, 0, 2, 0, 4])  # d d . d - ...
            sep = {2: 22, 3: 20, 4: 21}
            ans = np.zeros((b, ta), np.int64)
            for i in range(ta):
                ro = roles[i % len(roles)]
                ans[:, i] = (10 + rng.integers(0, 10, b) if ro == 0
                             else sep[ro])
            ids = np.concatenate([prompt, ans], 1).astype(np.int32)
            lab = np.concatenate(
                [np.full((b, tp), -100), ans], 1).astype(np.int32)
            return jnp.asarray(ids), jnp.asarray(lab)

        def ft_loss(tp, media, ids, lab):
            b, t = ids.shape
            mask = jnp.ones((b, t), bool)
            pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t))
            emb = decoder.embed_tokens(tp["text"], ids, tcfg)
            h, _ = dattn.text_prefill_with_caches(
                tp, cfg, emb, mask, pos, media,
                img_mask=img_mask, aud_mask=aud_mask, use_flash=use_flash)
            logits = decoder.lm_logits(tp["text"], h[:, :-1], tcfg)
            tgt = lab[:, 1:]
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(
                lp, jnp.maximum(tgt, 0)[..., None], axis=-1)[..., 0]
            m = (tgt >= 0).astype(jnp.float32)
            return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)

        tx0 = _optax.adafactor(learning_rate=3e-3)
        opt0 = tx0.init(teacher)

        @jax.jit
        def ft_step(tp, opt0, media, ids, lab):
            loss, grads = jax.value_and_grad(ft_loss)(tp, media, ids, lab)
            # towers/adapters frozen: only the text decoder trains (the
            # caches are fixed, so tower grads are zero anyway — zeroing
            # keeps adafactor state exact)
            grads = {k: (g if k == "text"
                         else jax.tree_util.tree_map(jnp.zeros_like, g))
                     for k, g in grads.items()}
            updates, opt0 = tx0.update(grads, opt0, tp)
            return _optax.apply_updates(tp, updates), opt0, loss

        for i in range(t_steps):
            # FRESH batch every step: recycling 16 fixed batches let the
            # 1.5B teacher pure-memorize them (loss 1.31, below the ~1.38
            # uniform-digit floor) while emitting 0% span tokens on unseen
            # rollout prompts — no generalization pressure, nothing for the
            # draft to meet at measurement time
            ids0, lab0 = tr_batch(i)
            teacher, opt0, tloss = ft_step(teacher, opt0, media, ids0, lab0)
            if i == 0:
                first = float(jax.device_get(tloss))
            last = tloss
        last = float(jax.device_get(last))
        print(f"spec teacher finetune: loss {first:.3f} -> {last:.3f} "
              f"over {t_steps} steps (vs ~1.38 task floor)", file=sys.stderr)
        del opt0

    if spec_quant:
        # serve-time quantization of the very caches the teacher trained on
        from vidi_tpu.infer.quantize import quantize_cache
        media = jax.jit(lambda m: m._replace(
            img_k=quantize_cache(m.img_k), img_v=quantize_cache(m.img_v),
            aud_k=quantize_cache(m.aud_k),
            aud_v=quantize_cache(m.aud_v)))(media)

    # --- distill a draft on the teacher's media-conditioned rollouts
    scfg = distill.student_config(cfg, layers=4, hidden=512, heads=8,
                                  kv_heads=4, head_dim=64, ffn=2048)
    import optax
    key = jax.random.PRNGKey(11)
    key, k_init = jax.random.split(key)
    student = dattn.init_params(k_init, scfg, jnp.float32)
    random_student = student
    tx = optax.adamw(3e-4)
    opt_state = tx.init(student)
    step = distill.make_step(scfg, tx)

    def rollout(k):
        # SAMPLED rollouts (same temperature as the measurement): greedy
        # rollouts of a random-weight teacher loop, which both flattens the
        # training signal and fakes the acceptance measurement
        k_ids, k_gen = jax.random.split(k)
        ids = jax.random.randint(k_ids, (batch, p_len), 3, tcfg.vocab_size,
                                 jnp.int32)
        res = generate(teacher, cfg, ids, jnp.ones((batch, p_len), bool),
                       img_mask=img_mask, aud_mask=aud_mask,
                       media_caches=media, max_new_tokens=g_len, eos_id=-1,
                       use_flash=use_flash, temperature=temp,
                       top_p=top_p, rng=k_gen)
        return jnp.concatenate([ids, res.tokens], axis=1)

    @jax.jit
    def teacher_targets(teacher, media, seqs):
        # teacher/media ride as ARGUMENTS: closing over them would inline
        # ~7.7 GB of on-device arrays as captured constants (host fetch +
        # re-ship over the 14 MB/s tunnel, double HBM residency)
        b, t = seqs.shape
        mask = jnp.ones((b, t), bool)
        pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t))
        emb = decoder.embed_tokens(teacher["text"], seqs, tcfg)
        h, _ = dattn.text_prefill_with_caches(
            teacher, cfg, emb, mask, pos, media,
            img_mask=img_mask, aud_mask=aud_mask, use_flash=use_flash)
        logits = decoder.lm_logits(teacher["text"], h, tcfg)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, :-1]

    t_d0 = time.perf_counter()
    seqs = soft = None
    span_frac = None
    for i in range(steps):
        if i % resample == 0:
            key, k = jax.random.split(key)
            seqs = rollout(k)
            soft = teacher_targets(teacher, media, seqs)
            if i == 0:
                # sanity: the finetuned teacher should emit mostly
                # span-alphabet tokens (ids 10..22) in its rollouts —
                # if not, the distillation has nothing learnable
                toks = np.asarray(seqs[:, p_len:])
                span_frac = float(((toks >= 10) & (toks <= 22)).mean())
                print(f"spec rollout diagnostic: {span_frac:.2%} of "
                      f"rollout tokens in the span alphabet",
                      file=sys.stderr)
        student, opt_state, loss = step(student, opt_state, seqs, soft, 1.0)
    kl = float(jax.device_get(loss))
    distill_wall = time.perf_counter() - t_d0
    draft = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, student)
    rand_draft = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, random_student)

    # --- measure on a FRESH prompt (held-out seed), batch-1 serving shape
    rng = np.random.default_rng(123)
    prompt = jnp.asarray(rng.integers(3, tcfg.vocab_size, (1, 64)), jnp.int32)
    pmask = jnp.ones((1, 64), bool)
    kw = dict(img_mask=img_mask, aud_mask=aud_mask, media_caches=media,
              eos_id=-1, use_flash=use_flash)

    inc = jax.jit(lambda a: a + 1)
    tiny = np.asarray(jax.device_get(inc(jnp.zeros((8,), jnp.int32))))
    t0 = time.perf_counter()
    for _ in range(3):
        tiny = np.asarray(jax.device_get(inc(jnp.asarray(tiny))))
    rtt = (time.perf_counter() - t0) / 3

    def timed(fn):
        fn()  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return max(best - rtt, 1e-6)

    mrng = jax.random.PRNGKey(999)  # measurement stream, fixed across modes
    sample_kw = dict(temperature=temp, top_p=top_p, rng=mrng)

    def run_gen(n, **extra):
        res = generate(teacher, cfg, prompt, pmask, max_new_tokens=n,
                       **kw, **extra)
        return np.asarray(jax.device_get(res.tokens))

    spec_stats = {}

    def run_spec(n, which, dp, dc):
        res = speculative_generate(teacher, cfg, dp, dc, prompt, pmask,
                                   spec_k=spec_k, max_new_tokens=n,
                                   **kw, **sample_kw)
        toks = np.asarray(jax.device_get(res.tokens))
        spec_stats[which] = (int(res.n_accepted.sum()),
                             int(res.n_drafted.sum()),
                             int(res.n_target_steps))
        return toks

    t_g1 = timed(lambda: run_gen(1))
    t_gn = timed(lambda: run_gen(n_decode))
    greedy_tok_s = (n_decode - 1) / max(t_gn - t_g1, 1e-6)
    t_b1 = timed(lambda: run_gen(1, **sample_kw))
    t_bn = timed(lambda: run_gen(n_decode, **sample_kw))
    sampled_tok_s = (n_decode - 1) / max(t_bn - t_b1, 1e-6)
    t_s1 = timed(lambda: run_spec(1, "warm", draft, scfg))
    t_sn = timed(lambda: run_spec(n_decode, "distilled", draft, scfg))
    spec_tok_s = (n_decode - 1) / max(t_sn - t_s1, 1e-6)
    # identical shapes -> no recompile for the random-draft acceptance floor
    run_spec(n_decode, "random", rand_draft, scfg)

    acc, drafted, passes = spec_stats["distilled"]
    acc_r, drafted_r, _ = spec_stats["random"]
    n_chips = jax.device_count()
    print(json.dumps({
        "metric": "speculative_decode_tok_s",
        "value": round(spec_tok_s / n_chips, 1),
        "unit": "tok/s/chip",
        "vs_baseline": round(spec_tok_s / sampled_tok_s, 3),
        "sampled_tok_s": round(sampled_tok_s / n_chips, 1),
        "greedy_tok_s": round(greedy_tok_s / n_chips, 1),
        "temperature": temp,
        "top_p": top_p,
        "acceptance": round(acc / max(drafted, 1), 3),
        "acceptance_random_draft": round(acc_r / max(drafted_r, 1), 3),
        "target_passes": passes,
        "decode_tokens": n_decode,
        "spec_k": spec_k,
        "distill_steps": steps,
        "distill_wall_s": round(distill_wall, 1),
        "distill_kl": round(kl, 4),
        "teacher_finetune_steps": t_steps,
        "teacher_loss": None if not t_steps else [round(first, 3),
                                                  round(last, 3)],
        "rollout_span_alphabet_frac": (None if span_frac is None
                                       else round(span_frac, 3)),
        "model": "1.5b-spec" + ("-int8kv" if spec_quant else ""),
        "kv_tokens": s_img + s_aud,
    }))


def bench_serve():
    """BENCH_MODE=serve: grouped same-video serving throughput — the product
    metric of shared-media prefix caching (run_benchmark groups queries by
    video; TR-V2 averages ~1.9 queries/video). Encode runs once per video in
    BOTH modes (run_benchmark memoizes it), so the timed comparison is the
    per-query prefill work:

      shared:    dattn.media_prefill once + ONE batched generate over Q query
                 rows reading the batch-1 media caches (run_benchmark's
                 ask_batch path)
      per-query: Q separate generate calls, each redoing the full stream
                 prefill (the reference's serving shape —
                 eval/inference.py:40-50 runs one forward per query)

    Emits queries/s/chip for the shared path + speedup_vs_per_query."""
    jax = _jax_setup()
    import numpy as np
    import jax.numpy as jnp
    from vidi_tpu.infer.generate import generate
    from vidi_tpu.models import dattn
    from vidi_tpu.models.adapters import budget_hw

    cfg = bench_config()
    video_seconds = int(os.environ.get("BENCH_SERVE_VIDEO_SECONDS", 600))
    n_queries = int(os.environ.get("BENCH_SERVE_QUERIES", 2))
    decode_tokens = int(os.environ.get("BENCH_DECODE_TOKENS", 32))
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)

    n_frames = video_seconds
    n_windows = max(video_seconds // 30, 1)
    rng = np.random.default_rng(0)
    size = cfg.vision.image_size
    frames = jax.device_put(rng.integers(
        0, 256, (1, n_frames, size, size, 3), np.uint8))
    mels = jnp.asarray(
        rng.standard_normal((1, n_windows, 128, 3000)), jnp.bfloat16)
    hw = budget_hw(n_frames, cfg.mm_image_pool_size,
                   cfg.vision.num_patches_per_side, cfg.mm_max_tokens_base)
    prompts = jnp.asarray(rng.integers(3, cfg.text.vocab_size,
                                       (n_queries, 64)), jnp.int32)
    pmask = jnp.ones((n_queries, 64), bool)

    @jax.jit
    def encode(params, frames, mels):
        img, im = dattn.encode_video_images(
            params, cfg, frames, jnp.asarray([n_frames], jnp.int32), hw,
            mm_chunks=32, use_flash=True)
        aud, am = dattn.encode_video_audios(
            params, cfg, mels, jnp.asarray([n_windows * 3000], jnp.int32),
            use_flash=True)
        return img, im, aud, am

    @jax.jit
    def media_prefill(params, img, im, aud, am):
        return dattn.media_prefill(params, cfg, img=img, img_mask=im,
                                   aud=aud, aud_mask=am, use_flash=True)

    img, im, aud, am = encode(params, frames, mels)

    def run_shared():
        media = media_prefill(params, img, im, aud, am)
        res = generate(params, cfg, prompts, pmask,
                       img_mask=im, aud_mask=am, media_caches=media,
                       max_new_tokens=decode_tokens, eos_id=1, use_flash=True)
        return np.asarray(jax.device_get(res.tokens))

    def run_per_query():
        outs = []
        for q in range(n_queries):
            res = generate(params, cfg, prompts[q:q + 1], pmask[q:q + 1],
                           img=img, img_mask=im, aud=aud, aud_mask=am,
                           max_new_tokens=decode_tokens, eos_id=1,
                           use_flash=True)
            outs.append(np.asarray(jax.device_get(res.tokens)))
        return outs

    def timeit(fn, reps=3):
        fn()  # compile + warmup
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    t_shared = timeit(run_shared)
    t_per_query = timeit(run_per_query)
    n_chips = jax.device_count()
    print(json.dumps({
        "metric": "grouped_serving_throughput",
        "value": round(n_queries / t_shared / n_chips, 3),
        "unit": "queries/s/chip",
        "vs_baseline": 1.0,
        "speedup_vs_per_query": round(t_per_query / t_shared, 3),
        "per_query_s": round(t_per_query / n_queries, 4),
        "shared_s": round(t_shared / n_queries, 4),
        "model": "1.5b-serve",
        "video_seconds": video_seconds,
        "queries_per_video": n_queries,
    }))


# --------------------------------------------------------------------------
# Resilient wrapper (default entry): probe -> headline -> variants, with the
# combined line re-printed (flushed) after EVERY variant so an outer timeout
# never erases completed results
# --------------------------------------------------------------------------

_PROBE_SRC = "import jax; print('DEVICES', jax.device_count())"


def _probe_backend(timeout_s: float) -> bool:
    """Probe backend init in fresh subprocesses with capped backoff — a
    failed axon init is cached per-process, so each attempt must be fresh."""
    deadline = time.monotonic() + timeout_s
    delay = 5.0
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run([sys.executable, "-c", _PROBE_SRC],
                               capture_output=True, text=True, timeout=240)
            if r.returncode == 0 and "DEVICES" in r.stdout:
                return True
            err = (r.stderr or r.stdout).strip().splitlines()
            err = err[-1] if err else "unknown"
        except subprocess.TimeoutExpired:
            err = "probe timeout"
        print(f"bench: backend probe {attempt} failed ({err})", file=sys.stderr)
        if time.monotonic() + delay > deadline:
            return False
        time.sleep(delay)
        delay = min(delay * 2, 60.0)


def _run_variant(name: str, env_overrides: dict, timeout_s: float):
    """Run one bench config in a subprocess; return its parsed json line or
    an {"error": ...} record. stderr goes to /tmp/bench_<name>.log."""
    env = dict(os.environ)
    env["BENCH_INNER"] = "1"
    env.update(env_overrides)
    log = f"/tmp/bench_{name}.log"
    try:
        with open(log, "w") as lf:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               stdout=subprocess.PIPE, stderr=lf, text=True,
                               timeout=timeout_s, env=env,
                               cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {timeout_s:.0f}s"}
    for line in reversed(r.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                pass
    tail = open(log).read().strip().splitlines()
    return {"error": f"rc={r.returncode}: {tail[-1] if tail else 'no output'}"}


def _captured_variants() -> set:
    """Variants already present (with a measured value) in any committed
    BENCH_r0*.json driver record. The driver writes {"tail": <stdout tail>,
    ...}; the wrapper's contract is that the LAST json line on stdout is
    headline + every completed variant, so parsing that line of each record
    recovers exactly what the driver has audited so far."""
    import glob
    captured = set()
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            rec = json.load(open(path))
        except Exception:
            continue
        for line in reversed((rec.get("tail") or "").strip().splitlines()):
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            for name, v in (obj.get("variants") or {}).items():
                if isinstance(v, dict) and v.get("value"):
                    captured.add(name)
            break
    return captured


def main():
    if os.environ.get("BENCH_INNER") == "1":
        mode = os.environ.get("BENCH_MODE")
        if mode == "train":
            return bench_train()
        if mode == "serve":
            return bench_serve()
        if mode == "spec":
            return bench_spec()
        return bench_inner()

    t_start = time.monotonic()
    probe_s = float(os.environ.get("BENCH_PROBE_TIMEOUT_S", 600))
    var_s = float(os.environ.get("BENCH_VARIANT_TIMEOUT_S", 1200))
    budget_s = float(os.environ.get("BENCH_TOTAL_BUDGET_S", 3300))
    var_budget_s = float(os.environ.get("BENCH_VARIANT_BUDGET_S", 1800))

    if not _probe_backend(probe_s):
        print(json.dumps({
            "metric": "hour_long_tr_video_throughput", "value": 0.0,
            "unit": "video_s/s/chip", "vs_baseline": 0.0,
            "error": f"backend unavailable after {probe_s:.0f}s of retries",
        }))
        return

    headline = _run_variant("headline", {}, var_s)
    if "error" in headline:
        # one more probe + retry: the tunnel can drop mid-run
        if _probe_backend(min(probe_s, 300)):
            retry = _run_variant("headline", {}, var_s)
            if "error" not in retry:
                headline = retry
    if "error" in headline:
        headline = {"metric": "hour_long_tr_video_throughput", "value": 0.0,
                    "unit": "video_s/s/chip", "vs_baseline": 0.0, **headline}
    # emit the headline immediately (flushed): if an outer timeout kills the
    # wrapper mid-variants, the LAST complete json line still carries the
    # round's number. Each completed variant below re-prints the combined
    # line, so the last line on stdout is always headline + every variant
    # finished so far — a kill can only lose the variant in flight.
    print(json.dumps(headline), flush=True)

    variant_envs = {
        "int8": {"BENCH_QUANT": "int8"},
        "int8kv": {"BENCH_QUANT": "int8kv"},
        "9b": {"BENCH_MODEL": "9b"},
        "2h": {"BENCH_VIDEO_SECONDS": "7200", "BENCH_DECODE_SPLIT": "0"},
        # opt-in (BENCH_VARIANTS=4h): too slow for the default budget.
        # Measured on-chip 2026-08-19: 988.5 video_s/s, MFU 0.92, rc=0 —
        # int8 KV is what makes 4 h of caches fit one 15.75-GiB chip
        # (bf16 KV alone would be ~18.6 GB; CLAUDE.md 2-h notes).
        "4h": {"BENCH_QUANT": "int8kv", "BENCH_VIDEO_SECONDS": "14400",
               "BENCH_DECODE_SPLIT": "0"},
        "train": {"BENCH_MODE": "train"},
        "serve": {"BENCH_MODE": "serve"},
        # opt-in (BENCH_VARIANTS=...,spec): distills a draft on chip first
        # (~minutes), so it stays outside the default driver window. The
        # measured record lives in CLAUDE.md / SPEC_DEMO.md.
        "spec": {"BENCH_MODE": "spec"},
    }
    # Self-auditing order: variants with NO driver-captured record in any
    # committed BENCH_r0*.json run first (canonical priority below breaks
    # ties); already-captured ones re-measure last with whatever window
    # remains. BENCH_VARIANTS overrides the order verbatim.
    canonical = ["train", "serve", "int8", "2h", "int8kv", "9b"]
    names_env = os.environ.get("BENCH_VARIANTS")
    if names_env is not None:
        order = [n for n in names_env.split(",") if n.strip()]
    else:
        captured = _captured_variants()
        order = ([n for n in canonical if n not in captured]
                 + [n for n in canonical if n in captured])
        print(f"bench: variant order {order} "
              f"(already driver-captured: {sorted(captured)})",
              file=sys.stderr)
    t_headline_done = time.monotonic()
    variants = {}
    for name in order:
        if name not in variant_envs:
            variants[name] = {"error": "unknown variant"}
        else:
            left = min(budget_s - (time.monotonic() - t_start),
                       var_budget_s - (time.monotonic() - t_headline_done))
            if left < 120:
                variants[name] = {"error": "skipped: variant budget exhausted"}
            else:
                t0 = time.monotonic()
                variants[name] = _run_variant(name, variant_envs[name],
                                              min(var_s, left))
                variants[name]["wall_s"] = round(time.monotonic() - t0, 1)
        out = {**headline, "variants": dict(variants)}
        if variants.get("int8kv", {}).get("value"):
            out["recommended_config"] = "int8kv"
        # Headline contract (settled, round 5): the headline value STAYS the
        # bf16 hour-long number. bf16 is the strict numerics-parity config
        # (matches the reference's bf16 compute path bit-for-policy; the
        # int8/int8kv configs are opt-in because they change numerics), and
        # BENCH_PREV/BENCH_r01..r04 continuity all measure bf16 — switching
        # the headline would make vs_baseline compare unlike configs.
        # int8kv (the fastest measured config, +34% over bf16, E2E
        # numerics-tested) is surfaced as "recommended_config" and its full
        # record rides the variants map; production serving should run it
        # (CLI: --load-8bit --load-8bit-towers --quantize-kv
        # --w8a8-prefill 256).
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
