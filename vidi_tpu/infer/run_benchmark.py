"""Batch benchmark-prediction runner: GT json + video dir -> results file.

Produces prediction files in the formats the evaluation harnesses consume
(reference output contract, SURVEY.md §2.7):

- TR / TR-V2: a json list of {"query_id", "video_id", "duration", "query",
  "answer": [[t0_s, t1_s], ...], "task"} — the shape of
  VUE_TR_V2/results_Vidi2.json; `answer` spans in SECONDS (model emits
  duration-normalized fractions, scaled here).
- STG: tubes.csv rows `query_id,time_ms,x0,y0,x1,y1` with 0-1-normalized
  boxes (VUE_STG/results/vidi2/tubes.csv schema). The model's STG text
  format is `t0-t1: x0,y0,x1,y1; ...` with normalized times and boxes — the
  reference repo ships no STG decoder (Vidi2 weights unreleased), so this
  framework defines the text convention and its parser together.
- VQA (VUE-PLOT Reasoning): the GT MCQ records + "pred_answer" — the input
  of VUE_PLOT/vqa_eval.py:25-44 / `vidi_tpu.evals.vue_plot vqa`.

Queries group by video (one encode per video, batched same-video generate),
and on the batch path the NEXT video host-decodes on a background thread
while the device encodes/generates for the current one (decode-ahead;
--stream-chunk instead overlaps decode within each video).

    python -m vidi_tpu.infer.run_benchmark --task tr \\
        --gt VUE-TRv2_ground_truth.json --video-dir vids/ \\
        --out results_mine.json [--limit N] [--random-weights tiny]
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import re
from typing import List, Tuple

STG_SEG_RE = re.compile(
    r"(\d\.\d+)-(\d\.\d+)\s*:\s*"
    r"([\d.]+)\s*,\s*([\d.]+)\s*,\s*([\d.]+)\s*,\s*([\d.]+)")


def parse_stg_tubes(text: str, duration_s: float,
                    step_ms: int = 1000) -> List[Tuple[int, Tuple[float, float, float, float]]]:
    """Model STG text -> [(time_ms, (x0, y0, x1, y1)), ...], one row per
    quantization step inside each segment. Coordinates divided by 1000 when
    > 1 (the 0-1000 convention, VUE_PLOT/character_eval.py:293-295)."""
    rows = []
    for m in STG_SEG_RE.finditer(text):
        t0, t1 = float(m.group(1)) * duration_s, float(m.group(2)) * duration_s
        box = [float(m.group(i)) for i in range(3, 7)]
        if any(c > 1 for c in box):
            box = [c / 1000.0 for c in box]
        t_ms = int(t0 * 1000)
        end_ms = int(t1 * 1000)
        while t_ms <= end_ms:
            rows.append((t_ms, tuple(box)))
            t_ms += step_ms
    return rows


def schedule_videos(ask_batch, gts, args):
    """Announce the ordered unique video paths of a sweep so the runner can
    host-decode video i+1 on a background thread while the device encodes /
    generates for video i (cross-video decode/compute overlap; within-video
    overlap needs --stream-chunk)."""
    vids = []
    for g in gts:
        p = os.path.join(args.video_dir, g["video_id"] + args.video_ext)
        if not vids or vids[-1] != p:
            vids.append(p)
    set_schedule = getattr(ask_batch, "set_schedule", None)
    if set_schedule is not None:
        set_schedule(vids)


def group_by_video(gts):
    """Stable-sort records so same-video queries are adjacent: the runner
    memoizes the last video's encoding, and VUE benchmarks repeat videos
    across queries (TR-V2: 1600 queries over 847 videos), so grouping
    amortizes the dominant encode cost. The eval harnesses join predictions
    to GT by query_id (reference VUE_TR_V2/qa_eval.py:303-340), so output
    order is free."""
    return sorted(gts, key=lambda g: g["video_id"])


def video_batches(gts, batch_size):
    """Yield lists of same-video records, at most `batch_size` long — the
    unit that runs as one batched generate call."""
    batch = []
    for g in gts:
        if batch and (g["video_id"] != batch[0]["video_id"]
                      or len(batch) >= batch_size):
            yield batch
            batch = []
        batch.append(g)
    if batch:
        yield batch


def ask_group(ask_batch, group, vid):
    """Run one same-video batch; on failure retry each query alone so a
    single bad query (or a batch OOM) costs one prediction, not the whole
    group. Returns (video length, [text per query])."""
    try:
        return ask_batch([g["query"] for g in group], vid,
                         options=[g.get("_options") for g in group])
    except Exception as e:  # noqa: BLE001 — keep the sweep going
        print(f"batch {group[0]['video_id']} x{len(group)}: {e!r}; "
              "retrying queries individually")
    length, texts = 0.0, []
    for g in group:
        try:
            length, (text,) = ask_batch([g["query"]], vid,
                                        options=[g.get("_options")])
        except Exception as e:  # noqa: BLE001
            print(f"{g['query_id']}: {e!r}")
            text = ""
        texts.append(text)
    return length, texts


def run_tr(args, ask_batch, parse_spans):
    with open(args.gt) as f:
        gts = json.load(f)
    if args.limit:
        gts = gts[: args.limit]
    gts = group_by_video(gts)
    schedule_videos(ask_batch, gts, args)
    out = []
    for group in video_batches(gts, args.batch_queries):
        vid = os.path.join(args.video_dir, group[0]["video_id"] + args.video_ext)
        length, texts = ask_group(ask_batch, group, vid)
        for g, text in zip(group, texts):
            spans = parse_spans(text, length)
            out.append({
                "query_id": g["query_id"],
                "video_id": g["video_id"],
                "duration": g.get("duration"),
                "query": g["query"],
                "answer": spans,
                "task": g.get("task", "temporal_retrieval"),
            })
            print(f"[{len(out)}/{len(gts)}] {g['query_id']} -> {spans}")
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"wrote {args.out} ({len(out)} predictions)")


_OPT_LETTER_RE = re.compile(r"^[A-Z]\.\s*")


def run_vqa(args, ask_batch):
    """VUE-PLOT Reasoning VQA: MCQ records (VUE-PLOT_Reasoning_VQA.json
    schema: problem_id/video_id/problem/options/answer/task_type) ->
    the same records + "pred_answer", the input format of the reference
    VUE_PLOT/vqa_eval.py:25-44 (and `vidi_tpu.evals.vue_plot vqa`)."""
    with open(args.gt) as f:
        gts = json.load(f)
    if args.limit:
        gts = gts[: args.limit]
    for g in gts:
        g.setdefault("query_id", g.get("problem_id"))
        g["query"] = g["problem"]
        # GT options carry their "A. " letters; the mcq prompt re-letters
        g["_options"] = [_OPT_LETTER_RE.sub("", o) for o in g["options"]]
    gts = group_by_video(gts)
    schedule_videos(ask_batch, gts, args)
    out = []
    for group in video_batches(gts, args.batch_queries):
        vid = os.path.join(args.video_dir, group[0]["video_id"] + args.video_ext)
        _, texts = ask_group(ask_batch, group, vid)
        for g, text in zip(group, texts):
            from vidi_tpu.infer.tasks import parse_mcq
            rec = {k: v for k, v in g.items()
                   if k not in ("_options", "query")}
            rec["pred_answer"] = parse_mcq(text)
            out.append(rec)
            print(f"[{len(out)}/{len(gts)}] {g['query_id']} -> "
                  f"{rec['pred_answer']!r}")
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"wrote {args.out} ({len(out)} predictions)")


def run_character(args, ask_batch):
    """VUE-PLOT Character Grounding: GT records {query_id, video_id,
    character, gt:[segments], duration?} -> {query_id, gt, pred, duration}
    — the self-contained input of the reference
    VUE_PLOT/character_eval.py:248-300 (`parse_result` reads gt and pred
    out of the same records) and `vidi_tpu.evals.vue_plot character`."""
    from vidi_tpu.infer.tasks import parse_character

    with open(args.gt) as f:
        gts = json.load(f)
    if args.limit:
        gts = gts[: args.limit]
    for g in gts:
        g["query"] = g.get("character", g.get("query", ""))
    gts = group_by_video(gts)
    schedule_videos(ask_batch, gts, args)
    out = []
    for group in video_batches(gts, args.batch_queries):
        vid = os.path.join(args.video_dir, group[0]["video_id"] + args.video_ext)
        length, texts = ask_group(ask_batch, group, vid)
        for g, text in zip(group, texts):
            duration = g.get("duration") or length
            segs = parse_character(text, duration)
            out.append({"query_id": g["query_id"],
                        "video_id": g["video_id"],
                        "character": g["query"],
                        "gt": g.get("gt", []),
                        "pred": segs,
                        "duration": duration})
            print(f"[{len(out)}/{len(gts)}] {g['query_id']}: "
                  f"{len(segs)} segments")
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"wrote {args.out} ({len(out)} predictions)")


def main():
    from vidi_tpu.core.compile_cache import setup_compile_cache
    setup_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=["tr", "stg", "vqa", "character"],
                    default="tr")
    ap.add_argument("--gt", required=True)
    ap.add_argument("--video-dir", required=True)
    ap.add_argument("--video-ext", default=".mp4")
    ap.add_argument("--out", required=True)
    ap.add_argument("--model-path", default=None)
    ap.add_argument("--random-weights", default=None)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--fps", type=float, default=1.0)
    ap.add_argument("--mm-splits", type=int, default=32)
    ap.add_argument("--max-new-tokens", type=int, default=1024)
    ap.add_argument("--load-8bit", action="store_true")
    ap.add_argument("--load-4bit", action="store_true",
                    help="group-wise int4 weight-only decoder (bnb nf4 "
                         "analog)")
    ap.add_argument("--load-8bit-towers", action="store_true",
                    help="int8 encoder towers with dynamic activation scales "
                         "(the BENCH_QUANT=int8 configuration; pairs with "
                         "--load-8bit)")
    ap.add_argument("--quantize-kv", action="store_true")
    ap.add_argument("--dtype", choices=["bfloat16", "float32"],
                    default="bfloat16",
                    help="model compute dtype (float32 for CPU runs — the "
                         "CPU backend has no bf16 dot kernels)")
    ap.add_argument("--w8a8-prefill", type=int, default=None, metavar="MIN_TOKENS")
    ap.add_argument("--batch-queries", type=int, default=4,
                    help="max same-video queries per batched generate call "
                         "(the batch-1 media caches are SHARED across the "
                         "rows — media_prefill — so extra queries cost text "
                         "prefill + decode only)")
    ap.add_argument("--stream-chunk", type=int, default=0, metavar="FRAMES",
                    help="overlap host decode with device encode in FRAMES-"
                         "frame chunks (0 = decode each video fully first)")
    ap.add_argument("--seq-parallel", type=int, default=1, metavar="N",
                    help="multi-chip: shard modality streams + KV caches "
                         "N-ways over a seq mesh axis")
    ap.add_argument("--model-parallel", type=int, default=1, metavar="N",
                    help="multi-chip: tensor-parallel decoder")
    ap.add_argument("--data-parallel", type=int, default=1, metavar="N",
                    help="multi-chip: data axis for the batched same-video "
                         "generate (--batch-queries rows spread over it)")
    ap.add_argument("--spec-ngram", action="store_true",
                    help="model-free speculative decoding (prompt-lookup "
                         "drafts verified in one W-token target forward); "
                         "output identical to greedy, per-row acceptance "
                         "printed")
    ap.add_argument("--spec-k", type=int, default=4,
                    help="speculative window width with --spec-ngram / "
                         "--draft-model-path")
    ap.add_argument("--draft-model-path", default=None,
                    help="small text-only draft checkpoint (train/distill.py "
                         "export) for model-draft speculative decoding; "
                         "overrides --spec-ngram")
    args = ap.parse_args()

    import numpy as np

    from vidi_tpu.infer.loader import load_model
    from vidi_tpu.infer import pipeline
    from vidi_tpu.media.video import get_media_length

    if args.w8a8_prefill is not None:
        from vidi_tpu.infer import quantize
        quantize.w8a8_min_tokens = args.w8a8_prefill

    mesh = None
    if (args.seq_parallel > 1 or args.model_parallel > 1
            or args.data_parallel > 1):
        import jax
        from vidi_tpu.core.mesh import make_mesh
        # exactly data*seq*model devices: a leftover data axis under a small
        # query batch only produces degenerate shardings + SPMD fallbacks
        n = args.data_parallel * args.seq_parallel * args.model_parallel
        devs = jax.devices()
        assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
        if len(devs) > n:
            print(f"using {n} of {len(devs)} devices (data x seq x model)")
        mesh = make_mesh(devs[:n], data=args.data_parallel,
                         seq=args.seq_parallel, model=args.model_parallel)

    # mesh passes INTO the loader: leaves land directly in their sharded
    # layout (a model bigger than one chip's HBM never stages whole)
    import jax.numpy as jnp
    params, cfg, tokenizer = load_model(args.model_path, args.random_weights,
                                        dtype=getattr(jnp, args.dtype),
                                        load_8bit=args.load_8bit,
                                        load_8bit_towers=args.load_8bit_towers,
                                        load_4bit=args.load_4bit, mesh=mesh)

    _draft = (None, None)
    if args.draft_model_path:
        d_params, d_cfg, _ = load_model(args.draft_model_path,
                                        dtype=getattr(jnp, args.dtype))
        _draft = (d_params, d_cfg)

    if mesh is not None:
        from vidi_tpu.parallel import sharding
        sharding.set_mesh(mesh)  # process-wide: every encode/generate below

    media_memo = {}  # last video only: {path: (length, im, am, media_caches)}
    decode_ahead = {"it": None}

    def set_schedule(vids):
        # --stream-chunk already overlaps decode with encode inside each
        # video; the decode-ahead thread covers the batch path across videos
        if args.stream_chunk or len(vids) < 2:
            return
        from vidi_tpu.train.prefetch import Prefetcher

        def host_decode_all():
            for v in vids:
                try:
                    yield v, pipeline.decode_media_host(v, cfg, fps=args.fps)
                except Exception as e:  # noqa: BLE001 — surfaced per video
                    yield v, e

        decode_ahead["it"] = iter(Prefetcher(host_decode_all(), depth=1))

    def encode_once(vid_path: str):
        prev = media_memo.get(vid_path)
        if isinstance(prev, Exception):
            raise prev  # failed decode: don't re-pull from the schedule
        if vid_path not in media_memo:
            media_memo.clear()  # hold one video's encoding at a time
            import jax

            use_flash = jax.default_backend() not in ("cpu",)
            if args.stream_chunk:
                enc = pipeline.encode_media(
                    params, cfg, vid_path, fps=args.fps,
                    mm_chunks=args.mm_splits, use_flash=use_flash,
                    stream_chunk=args.stream_chunk)
            else:
                host = None
                if decode_ahead["it"] is not None:
                    v, payload = next(decode_ahead["it"])
                    assert v == vid_path, (
                        f"decode schedule out of order: {v} != {vid_path}")
                    if isinstance(payload, Exception):
                        media_memo[vid_path] = payload
                        raise payload
                    host = payload
                if host is None:
                    host = pipeline.decode_media_host(vid_path, cfg,
                                                      fps=args.fps)
                enc = pipeline.encode_media_arrays(
                    params, cfg, *host, mm_chunks=args.mm_splits,
                    use_flash=use_flash)
            # one batch-1 stream prefill per video: the per-layer media
            # caches are text-independent (dattn.media_prefill), so every
            # query against this video shares them — the dominant prefill
            # cost runs once per video, not once per query row, and the
            # caches are never replicated across the query batch
            from vidi_tpu.models import dattn
            img, im, aud, am = enc
            media = dattn.media_prefill(
                params, cfg, img=img, img_mask=im, aud=aud, aud_mask=am,
                mm_chunks=args.mm_splits, use_flash=use_flash,
                quantize_caches=args.quantize_kv)
            media_memo[vid_path] = (get_media_length(vid_path), im, am, media)
        return media_memo[vid_path]


    # the VQA task reuses the single-video mcq prompt/parse pair
    prompt_task = "mcq" if args.task == "vqa" else args.task

    def ask_batch(queries: List[str], vid_path: str, options=None):
        """Batch Q same-video queries through ONE generate call: the video is
        encoded AND stream-prefilled once (shared batch-1 media caches), so
        each extra query costs only its text prefill + its share of the
        decode loop's weight reads. Returns (video length, [text per query])."""
        import jax
        import jax.numpy as jnp

        from vidi_tpu.infer.generate import generate

        length, im, am, media = encode_once(vid_path)
        q = len(queries)
        ids_list = [pipeline.build_prompt_ids(qy, tokenizer, cfg.mm_version,
                                              length, task=prompt_task,
                                              options=(options or [None] * q)[i])
                    for i, qy in enumerate(queries)]
        prompt, mask = pipeline.build_prompt_batch(ids_list)
        eos = pipeline.pick_eos(cfg, tokenizer)
        use_flash = jax.default_backend() not in ("cpu",)
        if args.spec_ngram or _draft[0] is not None:
            from vidi_tpu.infer.generate import speculative_generate
            res = speculative_generate(
                params, cfg, _draft[0], _draft[1],
                jnp.asarray(prompt), jnp.asarray(mask),
                img_mask=im, aud_mask=am, media_caches=media,
                max_new_tokens=args.max_new_tokens, eos_id=eos,
                spec_k=args.spec_k, use_flash=use_flash,
                mm_chunks=args.mm_splits)
            drafted = max(int(res.n_drafted.sum()), 1)
            print(f"  spec: {int(res.n_target_steps)} target passes, accept "
                  f"{int(res.n_accepted.sum())}/{drafted}")
        else:
            res = generate(params, cfg, jnp.asarray(prompt), jnp.asarray(mask),
                           img_mask=im, aud_mask=am, media_caches=media,
                           max_new_tokens=args.max_new_tokens, eos_id=eos,
                           use_flash=use_flash,
                           mm_chunks=args.mm_splits)
        toks = np.asarray(res.tokens)
        lens = np.asarray(res.lengths)
        texts = [tokenizer.decode(toks[r, : lens[r]],
                                  skip_special_tokens=True).strip()
                 for r in range(q)]
        return length, texts

    ask_batch.set_schedule = set_schedule

    def parse_spans(text: str, length: float) -> List[List[float]]:
        return [[r0 * length, r1 * length]
                for r0, r1 in pipeline.parse_time_ranges(text, cfg.mm_version)]

    if args.task == "tr":
        run_tr(args, ask_batch, parse_spans)
        return
    if args.task == "vqa":
        run_vqa(args, ask_batch)
        return
    if args.task == "character":
        run_character(args, ask_batch)
        return

    # STG: one tubes.csv over all queries
    with open(args.gt) as f:
        gts = json.load(f)
    if args.limit:
        gts = gts[: args.limit]
    gts = group_by_video(gts)
    schedule_videos(ask_batch, gts, args)
    done = 0
    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["query_id", "time_ms", "x0", "y0", "x1", "y1"])
        for group in video_batches(gts, args.batch_queries):
            vid = os.path.join(args.video_dir,
                               group[0]["video_id"] + args.video_ext)
            duration, texts = ask_group(ask_batch, group, vid)
            for g, text in zip(group, texts):
                rows = parse_stg_tubes(text, duration)
                for t_ms, box in rows:
                    w.writerow([g["query_id"], t_ms, *box])
                done += 1
                print(f"[{done}/{len(gts)}] {g['query_id']}: {len(rows)} rows")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
