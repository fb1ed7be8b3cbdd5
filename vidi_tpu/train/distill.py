"""Draft-model distillation for speculative decoding.

Trains a small text-only Dattn draft to imitate a (finetuned) target's
next-token behavior on the target's OWN greedy trajectories, so
`speculative_generate`'s acceptance rate — the whole speedup — is maximized
exactly where it is evaluated: on the sequences the target actually
produces. Greedy speculation only checks argmax agreement, so the loss is a
soft-label KL against the teacher distribution (sequence-level knowledge
distillation), which drives argmax agreement faster and smoother than hard
CE on the sampled token alone.

No reference equivalent (the reference decodes one token per forward,
gemma.py:603-687); this closes the model-draft half of the speculative
stack — the tokenizer/vocab-matched draft checkpoint that
`pipeline --draft-model-path` consumes (exported via the same HF-format
`save_pretrained` the finetune driver uses).

Usage:
    python -m vidi_tpu.train.distill --model_path TEACHER_DIR \
        --export_dir draft/ --draft_layers 4 --draft_hidden 512 \
        --steps 2000 --batch 8 --prompt_len 32 --gen_len 96 \
        [--load-8bit] [--dtype bfloat16] \
        [--prompts_path queries.jsonl --prompt_task tr]
The teacher loads bf16 by default (forward-only; --load-8bit for the 9B
single-chip envelope — fp32 9B would exceed HBM). --prompts_path seeds
rollouts from real task prompts wrapped in the production template, so
measured acceptance transfers to serving (see build_prompt_pool).
The draft is text-only by construction: trajectories here carry no media,
matching how the draft runs inside `speculative_generate` (it drafts from
the text prefix alone).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from vidi_tpu.core.config import DattnConfig
from vidi_tpu.models import dattn, decoder


def student_config(cfg: DattnConfig, *, layers: int, hidden: int,
                   heads: int, kv_heads: int, head_dim: int,
                   ffn: int) -> DattnConfig:
    """Teacher config -> draft config: same arch/vocab/specials (the
    tokenizer contract speculative decoding requires), scaled-down text
    stack. Towers shrink to tiny: the draft never sees media, so carrying
    the teacher's so400m/whisper geometry would waste ~1B junk params in
    init, fp32 Adam state (~12 bytes/param), and the exported checkpoint."""
    from vidi_tpu.core.config import AudioConfig, VisionConfig
    t = dataclasses.replace(
        cfg.text, num_layers=layers, hidden_size=hidden, num_heads=heads,
        num_kv_heads=kv_heads, head_dim=head_dim, intermediate_size=ffn)
    return dataclasses.replace(cfg, text=t, vision=VisionConfig.tiny(),
                               audio=AudioConfig.tiny())


def sample_trajectories(key, teacher, cfg: DattnConfig, *, batch: int,
                        prompt_len: int, gen_len: int,
                        prompt_pool=None,
                        random_frac: float = 0.5) -> jnp.ndarray:
    """[B, prompt_len + gen_len] teacher-greedy rollouts. eos_id=-1 never
    matches, so every row runs to full length — uniform shapes, one compile.

    Prompts are uniform-random token ids by default; `prompt_pool`
    ([N, prompt_len] int32 — real task prompts built by `build_prompt_pool`)
    seeds `1 - random_frac` of the rows from the pool instead, so the draft
    trains on the prompt distribution it will actually serve (TR/chapter
    templates are highly structured; acceptance measured on random prompts
    need not transfer). The random remainder keeps coverage off-template."""
    from vidi_tpu.infer.generate import generate
    vocab = cfg.text.vocab_size
    # pool-less path keeps the original single-key stream (rollout content
    # is seed-sensitive: tiny teachers collapse to short loops under some
    # prompt draws, which changes what there is to distill)
    k_ids, k_pick = (jax.random.split(key) if prompt_pool is not None
                     else (key, key))
    ids = jax.random.randint(k_ids, (batch, prompt_len), 3, vocab, jnp.int32)
    if prompt_pool is not None and len(prompt_pool):
        n_pool = batch - int(round(batch * random_frac))
        pick = jax.random.randint(k_pick, (n_pool,), 0,
                                  prompt_pool.shape[0], jnp.int32)
        ids = jnp.concatenate(
            [jnp.asarray(prompt_pool)[pick], ids[n_pool:]], axis=0)
    mask = jnp.ones((batch, prompt_len), bool)
    res = generate(teacher, cfg, ids, mask, max_new_tokens=gen_len,
                   eos_id=-1)
    return jnp.concatenate([ids, res.tokens], axis=1)


def build_prompt_pool(prompts_path: str, tokenizer, cfg: DattnConfig, *,
                      prompt_len: int, task: str = "none",
                      video_seconds: float = 600.0):
    """Real task prompts -> [N, prompt_len] int32 pool for
    sample_trajectories. One prompt per line: a JSON object ({"query": ...}
    / {"text": ...} / {"prompt": ...}) or a raw text line. `task != "none"`
    wraps each query in the production prompt template
    (pipeline.build_prompt_ids — chat markup, task instruction, video
    length), which is exactly what the draft sees at serving time. Rows
    left-truncate to the last `prompt_len` tokens (drafting continues the
    suffix) and left-pad short rows with bos/pad."""
    import json as _json

    import numpy as np

    from vidi_tpu.infer import pipeline

    texts = []
    with open(prompts_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                obj = _json.loads(line)
            except _json.JSONDecodeError:
                obj = None
            if isinstance(obj, dict):
                t = obj.get("query") or obj.get("text") or obj.get("prompt")
                if t:
                    texts.append(str(t))
            else:
                texts.append(line)
    pad_id = getattr(tokenizer, "pad_token_id", None)
    if pad_id is None:
        pad_id = getattr(tokenizer, "bos_token_id", 0) or 0
    rows = []
    for t in texts:
        if task != "none":
            ids = pipeline.build_prompt_ids(t, tokenizer, cfg.mm_version,
                                            video_seconds, task)
            ids = list(map(int, ids))
        else:
            ids = list(map(int, tokenizer(t).input_ids))
        ids = ids[-prompt_len:]
        rows.append([pad_id] * (prompt_len - len(ids)) + ids)
    return np.asarray(rows, np.int32) if rows else None


def _logits(params, cfg: DattnConfig, seqs: jnp.ndarray) -> jnp.ndarray:
    tcfg = cfg.text
    b, t = seqs.shape
    mask = jnp.ones((b, t), bool)
    pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t))
    embeds = decoder.embed_tokens(params["text"], seqs, tcfg)
    h, _ = dattn.forward(params, cfg, embeds, mask, pos)
    return decoder.lm_logits(params["text"], h, tcfg)  # [B, T, V] fp32


@functools.partial(jax.jit, static_argnames=("cfg", "temperature"))
def _teacher_targets(teacher, cfg, seqs, temperature: float = 1.0):
    lt = _logits(teacher, cfg, seqs)[:, :-1]
    return jax.nn.softmax(lt / temperature, axis=-1)


def distill_loss(student, scfg: DattnConfig, seqs: jnp.ndarray,
                 soft: jnp.ndarray, temperature: float = 1.0) -> jnp.ndarray:
    """KL(teacher || student) over next-token positions (constant teacher
    entropy dropped -> soft cross-entropy)."""
    ls = _logits(student, scfg, seqs)[:, :-1] / temperature
    logp = jax.nn.log_softmax(ls, axis=-1)
    return -jnp.mean(jnp.sum(soft * logp, axis=-1))


def make_step(scfg: DattnConfig, tx):
    @functools.partial(jax.jit, static_argnames=("temperature",))
    def step(student, opt_state, seqs, soft, temperature=1.0):
        loss, grads = jax.value_and_grad(distill_loss)(
            student, scfg, seqs, soft, temperature)
        updates, opt_state = tx.update(grads, opt_state, student)
        import optax
        return optax.apply_updates(student, updates), opt_state, loss
    return step


def run_distill(teacher, cfg: DattnConfig, scfg: DattnConfig, *,
                steps: int, batch: int, prompt_len: int, gen_len: int,
                lr: float = 3e-4, temperature: float = 1.0,
                resample_every: int = 8, seed: int = 0,
                log_every: int = 50, prompt_pool=None,
                random_frac: float = 0.5) -> Tuple[dict, float]:
    """-> (trained draft params, final loss). Fresh teacher rollouts every
    `resample_every` steps (on-policy data keeps the draft matched to what
    the teacher actually emits; re-sampling amortizes the rollout cost)."""
    import optax
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    student = dattn.init_params(k_init, scfg, jnp.float32)
    tx = optax.adamw(lr)
    opt_state = tx.init(student)
    step = make_step(scfg, tx)

    loss = jnp.inf
    seqs = soft = None
    for i in range(steps):
        if i % resample_every == 0:
            key, k = jax.random.split(key)
            seqs = sample_trajectories(k, teacher, cfg, batch=batch,
                                       prompt_len=prompt_len,
                                       gen_len=gen_len,
                                       prompt_pool=prompt_pool,
                                       random_frac=random_frac)
            soft = _teacher_targets(teacher, cfg, seqs,
                                    temperature=temperature)
        student, opt_state, loss = step(student, opt_state, seqs, soft,
                                        temperature)
        if log_every and (i % log_every == 0 or i == steps - 1):
            print(f"distill step {i}: kl {float(loss):.4f}")
    return student, float(loss)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model_path", default=None, help="teacher checkpoint")
    ap.add_argument("--random-weights", default=None,
                    help="tiny|9b|7b random teacher (plumbing check)")
    ap.add_argument("--export_dir", required=True)
    ap.add_argument("--draft_layers", type=int, default=4)
    ap.add_argument("--draft_hidden", type=int, default=512)
    ap.add_argument("--draft_heads", type=int, default=8)
    ap.add_argument("--draft_kv_heads", type=int, default=4)
    ap.add_argument("--draft_head_dim", type=int, default=64)
    ap.add_argument("--draft_ffn", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt_len", type=int, default=32)
    ap.add_argument("--gen_len", type=int, default=96)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--resample_every", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    # teacher inference is forward-only: bf16 (default) or int8 weights
    # suffice for rollouts + soft targets — a 9B fp32 teacher (~36 GB)
    # would neither fit the 15.75 GB HBM envelope nor transfer over the
    # tunnel in reasonable time. The DRAFT still trains fp32.
    ap.add_argument("--dtype", choices=["bfloat16", "float32"],
                    default="bfloat16", help="teacher compute/load dtype")
    ap.add_argument("--load-8bit", action="store_true",
                    help="int8 weight-only teacher (the 9B single-chip "
                         "envelope)")
    ap.add_argument("--load-8bit-towers", action="store_true")
    ap.add_argument("--prompts_path", default=None,
                    help="file of real task prompts (JSONL with "
                         "query/text/prompt fields, or raw lines) seeding "
                         "teacher rollouts — see build_prompt_pool")
    ap.add_argument("--prompt_task", default="tr",
                    help="wrap --prompts_path queries in this task's "
                         "production prompt template ('none' = tokenize "
                         "the raw text)")
    ap.add_argument("--prompt_video_seconds", type=float, default=600.0,
                    help="nominal video length baked into templated "
                         "prompts")
    ap.add_argument("--random_frac", type=float, default=0.5,
                    help="with --prompts_path: fraction of rollout rows "
                         "that keep uniform-random prompts for coverage")
    args = ap.parse_args(argv)

    from vidi_tpu.infer.export import save_pretrained
    from vidi_tpu.infer.loader import load_model

    teacher, cfg, tok = load_model(args.model_path, args.random_weights,
                                   dtype=getattr(jnp, args.dtype),
                                   load_8bit=args.load_8bit,
                                   load_8bit_towers=args.load_8bit_towers)
    scfg = student_config(
        cfg, layers=args.draft_layers, hidden=args.draft_hidden,
        heads=args.draft_heads, kv_heads=args.draft_kv_heads,
        head_dim=args.draft_head_dim, ffn=args.draft_ffn)
    pool = None
    if args.prompts_path:
        pool = build_prompt_pool(args.prompts_path, tok, cfg,
                                 prompt_len=args.prompt_len,
                                 task=args.prompt_task,
                                 video_seconds=args.prompt_video_seconds)
        if pool is not None:
            print(f"prompt pool: {pool.shape[0]} templated prompts "
                  f"({args.prompt_task}), random_frac {args.random_frac}")
    student, loss = run_distill(
        teacher, cfg, scfg, steps=args.steps, batch=args.batch,
        prompt_len=args.prompt_len, gen_len=args.gen_len, lr=args.lr,
        temperature=args.temperature, resample_every=args.resample_every,
        seed=args.seed, prompt_pool=pool, random_frac=args.random_frac)
    save_pretrained(jax.device_get(student), scfg, args.export_dir,
                    tokenizer_src=args.model_path)
    print(f"draft exported to {args.export_dir} (final kl {loss:.4f}); use "
          f"with: pipeline --draft-model-path {args.export_dir}")


if __name__ == "__main__":
    main()
