"""Draft distillation (`train/distill.py`): the KL actually optimizes, the
distilled draft ACCEPTS in speculative decoding (the point of the module),
the output-identity contract is untouched, and the exported draft reloads
through the standard HF-format loader into the same speculative results.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidi_tpu.core.config import DattnConfig
from vidi_tpu.models import dattn
from vidi_tpu.infer.generate import generate, speculative_generate
from vidi_tpu.train import distill


def _tiny_student_cfg(cfg):
    return distill.student_config(cfg, layers=2, hidden=32, heads=2,
                                  kv_heads=1, head_dim=16, ffn=64)


def test_prompt_pool_seeds_trajectories(tmp_path):
    """--prompts_path: real task prompts (templated) seed the rollout rows;
    pool rows left-truncate/pad to prompt_len and mix with random rows per
    random_frac."""
    import json

    from vidi_tpu.infer.loader import load_model

    teacher, cfg, tok = load_model(None, "tiny", dtype=jnp.float32)
    p = tmp_path / "prompts.jsonl"
    p.write_text(json.dumps({"query": "a red square appears"}) + "\n"
                 + "the opening shot of the video\n"
                 + json.dumps({"text": "somebody speaks"}) + "\n")

    pool = distill.build_prompt_pool(str(p), tok, cfg, prompt_len=16,
                                     task="tr", video_seconds=120.0)
    assert pool.shape == (3, 16) and pool.dtype == np.int32
    raw = distill.build_prompt_pool(str(p), tok, cfg, prompt_len=16,
                                    task="none")
    assert raw.shape == (3, 16)
    # templated prompts differ from raw tokenization (chat markup + task
    # instruction around the query)
    assert not np.array_equal(pool, raw)

    seqs = distill.sample_trajectories(
        jax.random.PRNGKey(0), teacher, cfg, batch=4, prompt_len=16,
        gen_len=4, prompt_pool=pool, random_frac=0.5)
    assert seqs.shape == (4, 20)
    # the first batch*(1-random_frac) rows carry pool prompts verbatim
    got_prompts = np.asarray(seqs[:2, :16])
    assert all(any(np.array_equal(r, pr) for pr in pool)
               for r in got_prompts)


@pytest.mark.slow
def test_distilled_draft_accepts_and_reloads(tmp_path):
    cfg = DattnConfig.tiny()
    teacher = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    scfg = _tiny_student_cfg(cfg)

    # initial loss, for the "it optimizes" check
    k = jax.random.PRNGKey(1)
    seqs = distill.sample_trajectories(k, teacher, cfg, batch=4,
                                       prompt_len=8, gen_len=24)
    soft = distill._teacher_targets(teacher, cfg, seqs)
    random_student = dattn.init_params(jax.random.PRNGKey(42), scfg,
                                       jnp.float32)
    loss0 = float(distill.distill_loss(random_student, scfg, seqs, soft))

    student, loss = distill.run_distill(
        teacher, cfg, scfg, steps=120, batch=4, prompt_len=8, gen_len=24,
        lr=1e-3, resample_every=16, seed=3, log_every=0)
    assert loss < loss0 * 0.7, (loss0, loss)

    # fresh prompts: output identity + the distilled draft out-accepts a
    # random-init draft of the same shape
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(3, cfg.text.vocab_size, (2, 8)))
    mask = jnp.ones((2, 8), bool)
    kw = dict(spec_k=4, max_new_tokens=16, eos_id=2)
    want = generate(teacher, cfg, ids, mask, max_new_tokens=16, eos_id=2)

    got = speculative_generate(teacher, cfg, student, scfg, ids, mask, **kw)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))
    base = speculative_generate(teacher, cfg, random_student, scfg, ids,
                                mask, **kw)
    acc = int(got.n_accepted.sum()) / max(int(got.n_drafted.sum()), 1)
    acc0 = int(base.n_accepted.sum()) / max(int(base.n_drafted.sum()), 1)
    assert acc >= acc0, (acc, acc0)
    assert acc > 0.3, acc  # tiny-greedy trajectories are learnable

    # export -> reload through the standard loader -> identical speculation
    from vidi_tpu.infer.export import save_pretrained
    from vidi_tpu.infer.loader import load_model
    out = str(tmp_path / "draft")
    save_pretrained(jax.device_get(student), scfg, out)
    re_params, re_cfg, _ = load_model(out, dtype=jnp.float32)
    assert re_cfg.text == scfg.text
    re_got = speculative_generate(teacher, cfg, re_params, re_cfg, ids,
                                  mask, **kw)
    np.testing.assert_array_equal(np.asarray(re_got.tokens),
                                  np.asarray(got.tokens))
    assert int(re_got.n_accepted.sum()) == int(got.n_accepted.sum())
