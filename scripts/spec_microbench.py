"""On-chip microbench: W-token `dattn.verify_step` vs 1-token
`dattn.decode_step` at hour-long-KV geometry — the speculative-decoding
speedup budget.

Batch-1 decode is HBM-bound streaming weights + KV caches; the claim behind
`speculative_generate` (infer/generate.py) is that a W-token verify pass
costs ~one decode step, so accepted draft tokens are ~free. This measures
that ratio directly: chained loops (each step depends on the previous
cache/token, tunnel-amortized over N_STEPS — single-shot timings sit on the
33 ms sync floor and are garbage) at the bench 1.5B geometry with
hour-scale modality caches (90k img + 36k aud tokens).

Usage (real chip):
    python scripts/spec_microbench.py            # W = 2, 4, 8
    SPEC_IMG_TOKENS=9000 python scripts/spec_microbench.py   # smaller KV
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/vidi_tpu_jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from bench import bench_config
    from vidi_tpu.models import dattn, decoder

    cfg = bench_config()
    tcfg = cfg.text
    L, Hk, D = tcfg.num_layers, tcfg.num_kv_heads, tcfg.head_dim
    S_img = int(os.environ.get("SPEC_IMG_TOKENS", 90_000))
    S_aud = int(os.environ.get("SPEC_AUD_TOKENS", 36_000))
    N_STEPS = int(os.environ.get("SPEC_STEPS", 50))
    S_text = 64 + N_STEPS * 9 + 8  # prompt + worst window chain + slack

    key = jax.random.PRNGKey(0)
    params = dattn.init_params(key, cfg, jnp.bfloat16)

    ks = jax.random.split(key, 6)
    mk = lambda k, s: (jax.random.normal(k, (L, 1, Hk, s, D), jnp.bfloat16)
                       * 0.1)
    caches = dattn.Caches(
        text_k=mk(ks[0], S_text), text_v=mk(ks[1], S_text),
        img_k=mk(ks[2], S_img), img_v=mk(ks[3], S_img),
        aud_k=mk(ks[4], S_aud), aud_v=mk(ks[5], S_aud))
    img_mask = jnp.ones((1, S_img), bool)
    aud_mask = jnp.ones((1, S_aud), bool)
    cur0 = jnp.asarray([64], jnp.int32)
    tok0 = jnp.asarray([7], jnp.int32)

    def decode_chain(params, caches, cur, tok):
        def body(i, st):
            tok, cur, caches = st
            emb = decoder.embed_tokens(params["text"], tok[:, None], tcfg)
            logits, caches = dattn.decode_step(
                params, cfg, emb, cur, caches,
                img_mask=img_mask, aud_mask=aud_mask)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cur + 1, caches)
        tok, cur, caches = lax.fori_loop(0, N_STEPS, body, (tok, cur, caches))
        return tok, caches

    def verify_chain(W):
        def chain(params, caches, cur, tok):
            def body(i, st):
                tok, cur, caches = st
                # the window the speculative loop would verify: current
                # token + W-1 "draft" tokens (content is irrelevant to cost)
                window = jnp.tile(tok[:, None], (1, W))
                emb = decoder.embed_tokens(params["text"], window, tcfg)
                logits, caches = dattn.verify_step(
                    params, cfg, emb, cur, caches,
                    img_mask=img_mask, aud_mask=aud_mask)
                nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                return (nxt, cur + W, caches)
            tok, cur, caches = lax.fori_loop(0, N_STEPS, body,
                                             (tok, cur, caches))
            return tok, caches
        return chain

    def timeit(fn, label):
        # no donation: peak HBM = base caches + ONE output copy (+ params);
        # donation with per-rep copies held 3 cache-sized buffers and OOM'd
        jfn = jax.jit(fn)
        tok, out = jfn(params, caches, cur0, tok0)   # compile + warm
        jax.device_get(tok)
        del out
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            tok, out = jfn(params, caches, cur0, tok0)
            jax.device_get(tok)
            del out
            best = min(best, time.perf_counter() - t0)
        us = best / N_STEPS * 1e6
        print(f"{label}: {us:9.1f} us/pass  ({best*1e3:.1f} ms / "
              f"{N_STEPS} chained passes)")
        return us

    print(f"geometry: bench-1.5B L={L} Hk={Hk} D={D}, img {S_img} + aud "
          f"{S_aud} tokens of bf16 KV "
          f"({(S_img + S_aud) * L * Hk * D * 2 * 2 / 2**30:.2f} GiB)")
    d_us = timeit(decode_chain, "decode_step  (W=1)")
    for W in (2, 4, 8):
        v_us = timeit(verify_chain(W), f"verify_step  (W={W})")
        # full-acceptance commit = W tokens/pass (W-1 drafts + target's own)
        print(f"  -> verify/decode cost {v_us / d_us:.2f}x; ceiling "
              f"{W / (v_us / d_us):.2f}x tok/s at full acceptance "
              f"(before draft cost)")


if __name__ == "__main__":
    main()
