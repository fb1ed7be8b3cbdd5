"""Benchmark: hour-long-video temporal-retrieval throughput per chip.

Measures the full TR compute path — device-side frame preprocessing, SigLIP
tower, pooling/projection, Dattn prefill (text self-attn + cross-attn over the
video/audio streams + diagonal updates), and greedy decode — on synthetic
media, and reports video-seconds processed per wall-second per chip.

The model is a reduced-geometry Dattn (the 9B does not fit a single v5e's
16 GB HBM; multi-chip runs shard it — see parallel/sharding.py). The metric
divides by chip count, so it is comparable across scales.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
No reference throughput is published (BASELINE.md) -> vs_baseline is the
ratio to the previous recorded run when BENCH_PREV.json exists, else 1.0.
"""
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/vidi_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vidi_tpu.core.config import AudioConfig, DattnConfig, TextConfig, VisionConfig
from vidi_tpu.infer.generate import generate
from vidi_tpu.models import dattn
from vidi_tpu.models.adapters import budget_hw


def bench_config() -> DattnConfig:
    """~1B-scale Dattn with the 9B's structure (fits one v5e chip in bf16)."""
    return DattnConfig(
        text=TextConfig(
            arch="gemma2", vocab_size=32768, hidden_size=1536, num_layers=12,
            num_heads=12, num_kv_heads=6, head_dim=128, intermediate_size=6144,
            sliding_window=4096, attn_softcap=50.0, final_softcap=30.0,
            query_scale=128.0**-0.5,
        ),
        vision=VisionConfig(hidden_size=768, num_layers=12, num_heads=12,
                            intermediate_size=3072, patch_size=14, image_size=384),
        audio=AudioConfig(d_model=768, num_layers=8, num_heads=12, ffn_dim=3072),
        mm_time_interval=1024,
    )


def main():
    video_seconds = int(os.environ.get("BENCH_VIDEO_SECONDS", 3600))
    mm_chunks = int(os.environ.get("BENCH_MM_SPLITS", 32))  # reference inference.py:86 uses 32
    decode_tokens = int(os.environ.get("BENCH_DECODE_TOKENS", 32))
    cfg = bench_config()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    bench_quant = os.environ.get("BENCH_QUANT", "")
    if bench_quant.startswith("int8"):
        # Opt-in quantized configurations (NOT the default/recorded metric):
        # int8 towers + weight-only int8 decoder with W8A8 routing for
        # prefill-sized matmuls — the CLI's --load-8bit --load-8bit-towers
        # --w8a8-prefill 256 combination. Measured: 791 video_s/s/chip vs
        # the 737 bf16 default. "int8kv" additionally stores the modality KV
        # caches per-token int8 (--quantize-kv): ~3% slower (769) but halves
        # cache HBM — the memory-stretch configuration.
        from vidi_tpu.infer import quantize
        params = quantize.quantize_params(params, ("text", "vision", "audio"))
        quantize.w8a8_min_tokens = 256
    quant_caches = bench_quant == "int8kv"

    n_frames = video_seconds  # 1 fps, the reference default
    n_windows = max(video_seconds // 30, 1)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.standard_normal((1, n_frames, 384, 384, 3)), jnp.bfloat16)
    mels = jnp.asarray(
        rng.standard_normal((1, n_windows, 128, 3000)), jnp.bfloat16)
    hw = budget_hw(n_frames, cfg.mm_image_pool_size)
    prompt = jnp.asarray(rng.integers(3, cfg.text.vocab_size, (1, 64)), jnp.int32)
    pmask = jnp.ones((1, 64), bool)

    @jax.jit
    def encode(params, frames, mels):
        # towers use the single-block Pallas tower_attention kernel (whole
        # 729-token sequence in VMEM): measured 3.8 ms vs XLA's 10.3 ms per
        # 120 frames per layer on v5e (the old multi-block flash kernel was
        # SLOWER than XLA here, 0.34 s vs 0.24 s / 120 frames)
        img, im = dattn.encode_video_images(
            params, cfg, frames, jnp.asarray([n_frames], jnp.int32), hw,
            mm_chunks=mm_chunks, use_flash=True)
        aud, am = dattn.encode_video_audios(
            params, cfg, mels, jnp.asarray([n_windows * 3000], jnp.int32),
            use_flash=True)
        return img, im, aud, am

    def run():
        img, im, aud, am = encode(params, frames, mels)
        res = generate(params, cfg, prompt, pmask, img=img, img_mask=im,
                       aud=aud, aud_mask=am, max_new_tokens=decode_tokens,
                       eos_id=1, use_flash=True,  # eos never sampled
                       quantize_caches=quant_caches)
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

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    t = max(min(times) - rtt, 1e-6)

    n_chips = jax.device_count()
    value = video_seconds / t / n_chips

    vs = 1.0
    if os.path.exists("BENCH_PREV.json"):
        try:
            prev = json.load(open("BENCH_PREV.json"))
            if prev.get("value"):
                vs = value / prev["value"]
        except Exception:
            pass
    print(json.dumps({
        "metric": "hour_long_tr_video_throughput",
        "value": round(value, 3),
        "unit": "video_s/s/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
