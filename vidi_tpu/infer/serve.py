"""Online serving daemon: JSONL requests in, JSONL responses out.

Beyond the reference (whose serving story is one-shot batch scripts,
Vidi1.5_9B/eval/inference.py): an always-on loop for production serving —

- **Request micro-batching**: the loop blocks for one request, then drains
  whatever else has already arrived (plus an optional ``--linger`` wait) and
  groups pending queries by video. Up to ``--batch-queries`` same-video rows
  share ONE batched generate call: the hour-scale media caches are batch-1
  and shared across the rows (``dattn.media_prefill``), so an extra query
  costs only its text prefill + its share of the decode weight reads.
- **Media-cache LRU**: the last ``--media-cache`` videos' stream caches stay
  resident in HBM. A repeat query against a hot video skips host decode,
  tower encode AND stream prefill entirely (the dominant per-query cost;
  TR-V2-like workloads average ~1.9 queries/video — measured 1.96x in the
  bench ``serve`` variant).
- **Decode-ahead** (``--decode-ahead``, OFF by default): while the current
  bundle encodes/generates on device, the next pending video host-decodes
  on a background thread (the run_benchmark pattern). Numerics identical:
  the payload feeds the same ``encode_media_arrays`` path. Measured on the
  1-core chip host (4x 600-s videos, warm compile cache, 32-token
  generates): 104-112 s serial vs 122-125 s overlapped — the GIL-held
  mel/resize work contends with the main thread's dispatch and the short
  generate gives almost no device time to hide under, so it LOSES there.
  Enable on multi-core hosts and/or long-generate workloads where the
  device window exceeds the decode cost. ``--stream-chunk`` instead
  overlaps decode WITHIN each video (measured win, CLAUDE.md) and
  disables the cross-video thread.
- **Speculative decode**: model-free prompt-lookup drafts (``--spec-ngram``)
  or a distilled model draft (``--draft-model-path``, train/distill.py
  export) verified in W-token target forwards; output identical to plain
  greedy (distribution-exact under --temperature via rejection sampling).
  Measured on chip with a distilled draft at hour-long KV: 2.13x tok/s.
- **Per-request error isolation**: a failed request answers
  ``{"id":..., "error":...}`` without killing the loop (the runner's
  retry-individually pattern, run_benchmark.py).

Request line:  {"id": str, "video": path, "query": str, "task": "tr",
                "options": [..]?}   (task defaults to "tr")
Response line: {"id": str, "text": str, "parsed": str, "video_s": float,
                "cached_media": bool} | {"id": str, "error": str}

Usage:
    python -m vidi_tpu.infer.serve --model-path DIR [--in req.jsonl]
        [--out resp.jsonl] [--media-cache 4] [--batch-queries 4]
        [--spec-ngram] [--load-8bit --quantize-kv ...]
EOF on the request stream drains pending work, prints stats to stderr, and
exits 0.
"""
from __future__ import annotations

import argparse
import json
import queue
import sys
import threading
import time
from collections import OrderedDict, deque
from typing import Callable, Iterable, Optional


class MediaLRU:
    """Most-recently-used videos' (length, img_mask, aud_mask, media_caches)
    tuples. Eviction drops the python refs; the backing HBM buffers free when
    the last generate using them completes."""

    def __init__(self, capacity: int):
        self.capacity = max(capacity, 1)
        self._od: OrderedDict = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, key):
        if key in self._od:
            self._od.move_to_end(key)
            self.hits += 1
            return self._od[key]
        self.misses += 1
        return None

    def put(self, key, value):
        self._od[key] = value
        self._od.move_to_end(key)
        while len(self._od) > self.capacity:
            self._od.popitem(last=False)

    def __contains__(self, key):  # peek without touching hit/miss stats
        return key in self._od


def _stack_media(entries):
    """[(img_mask, aud_mask, media_caches)] for B distinct videos ->
    batch-B masks + caches, S-padded to the longest stream (padded slots
    are mask-False and never attended; quantized cache dicts pad qi8 with
    zeros / scale with ones). This is the cross-video batching form: each
    text row carries ITS OWN video's caches, so the decode loop's weight
    stream amortizes across videos — the win for cold single-query
    short-clip mixes, where nothing is shareable batch-1."""
    import jax.numpy as jnp

    def stack_masks(ms):
        if all(m is None for m in ms):
            return None
        # all-or-none per modality: a mixed bundle would silently drop the
        # modality for every row (serve_loop groups bundles by modality
        # signature, so this is a hard invariant, not a recoverable state)
        assert not any(m is None for m in ms), (
            "cross-video bundle mixes present/absent modalities")
        s = max(m.shape[1] for m in ms)
        return jnp.concatenate(
            [jnp.pad(m, ((0, 0), (0, s - m.shape[1]))) for m in ms], axis=0)

    def pad_leaf(x, s):
        if isinstance(x, dict):
            out = dict(x)
            d = s - x["qi8"].shape[3]
            out["qi8"] = jnp.pad(x["qi8"], [(0, 0)] * 3 + [(0, d), (0, 0)])
            out["scale"] = jnp.pad(x["scale"],
                                   [(0, 0)] * 3 + [(0, d), (0, 0)],
                                   constant_values=1.0)
            return out
        return jnp.pad(x, [(0, 0)] * 3 + [(0, s - x.shape[3]), (0, 0)])

    def stack_caches(cs):
        if all(c is None for c in cs):
            return None
        assert not any(c is None for c in cs), (
            "cross-video bundle mixes present/absent modality caches")
        s_of = lambda c: (c["qi8"] if isinstance(c, dict) else c).shape[3]
        padded = [pad_leaf(c, max(s_of(c) for c in cs)) for c in cs]
        if isinstance(padded[0], dict):
            return {k: jnp.concatenate([p[k] for p in padded], axis=1)
                    for k in padded[0]}
        return jnp.concatenate(padded, axis=1)

    ims, ams, medias = zip(*entries)
    media = medias[0]._replace(
        img_k=stack_caches([m.img_k for m in medias]),
        img_v=stack_caches([m.img_v for m in medias]),
        aud_k=stack_caches([m.aud_k for m in medias]),
        aud_v=stack_caches([m.aud_v for m in medias]))
    return stack_masks(ims), stack_masks(ams), media


def _reader(stream, q: "queue.Queue"):
    """stdin/file -> queue; one JSON object per line; None = EOF."""
    for line in stream:
        line = line.strip()
        if not line:
            continue
        try:
            q.put(json.loads(line))
        except json.JSONDecodeError as e:
            q.put({"_bad_line": line, "_err": str(e)})
    q.put(None)


def serve_loop(
    params,
    cfg,
    tokenizer,
    requests: "queue.Queue",
    emit: Callable[[dict], None],
    *,
    fps: float = 1.0,
    mm_splits: int = 32,
    max_new_tokens: int = 1024,
    batch_queries: int = 4,
    batch_videos: int = 1,
    media_cache: int = 4,
    quantize_kv: bool = False,
    stream_chunk: int = 0,
    spec_ngram: bool = False,
    draft=None,  # (draft_params, draft_cfg) — model-draft speculative decode
    spec_k: int = 4,
    linger_s: float = 0.0,
    decode_ahead: bool = False,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    seed: int = 0,
    chunked_prefill_tokens: int = 131072,
) -> dict:
    """Drain `requests` (a Queue fed by a reader thread; None = EOF),
    emitting one response dict per request. Returns serving stats."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vidi_tpu.infer import pipeline
    from vidi_tpu.infer.generate import generate, speculative_generate
    from vidi_tpu.media.video import get_media_length
    from vidi_tpu.models import dattn

    use_flash = jax.default_backend() not in ("cpu",)
    lru = MediaLRU(media_cache)
    pending: deque = deque()
    eof = False
    served = 0
    errors = 0
    generate_calls = 0
    overlapped_decodes = 0
    sample_rng = jax.random.PRNGKey(seed) if temperature > 0 else None
    t_start = time.perf_counter()

    def pull(timeout: Optional[float] = None) -> bool:
        """Move one queue item into `pending`; False on EOF/empty.
        timeout None = block until something arrives; 0 = non-blocking."""
        nonlocal eof, errors
        if eof:
            return False
        try:
            if timeout is None:
                item = requests.get()
            elif timeout == 0:
                item = requests.get_nowait()
            else:
                item = requests.get(timeout=timeout)
        except queue.Empty:
            return False
        if item is None:
            eof = True
            return False
        if not isinstance(item, dict) or "_bad_line" in item:
            why = (item.get("_err") if isinstance(item, dict)
                   else f"not a JSON object: {item!r}")
            emit({"id": None, "error": f"bad request line: {why}"})
            errors += 1
            return True
        if not item.get("video") or "query" not in item:
            emit({"id": item.get("id"),
                  "error": "request needs 'video' and 'query' fields"})
            errors += 1
            return True
        pending.append(item)
        return True

    # decode-ahead: one background thread host-decodes the next pending
    # un-cached video while the device works on the current bundle. The
    # payload feeds pipeline.encode_media_arrays — the exact host/device
    # split encode_media uses internally, so numerics are identical
    # (test_serve_decode_ahead_matches). --stream-chunk overlaps decode
    # within each video instead, so the thread is disabled there.
    ahead: dict = {"path": None, "thread": None, "payload": None}

    def _ahead_worker(path):
        try:
            ahead["payload"] = pipeline.decode_media_host(path, cfg, fps=fps)
        except Exception as e:  # noqa: BLE001 — re-raised at encode()
            ahead["payload"] = e

    def start_ahead():
        if not decode_ahead or stream_chunk or ahead["thread"] is not None:
            return
        for r in pending:
            v = r.get("video")
            if v and v not in lru:
                ahead.update(path=v, payload=None,
                             thread=threading.Thread(target=_ahead_worker,
                                                     args=(v,), daemon=True))
                ahead["thread"].start()
                return

    def encode(vid_path: str):
        nonlocal overlapped_decodes
        got = lru.get(vid_path)
        if got is not None:
            return got + (True,)
        host = None
        if ahead["path"] == vid_path and ahead["thread"] is not None:
            ahead["thread"].join()
            payload = ahead["payload"]
            ahead.update(path=None, thread=None, payload=None)
            if isinstance(payload, Exception):
                raise payload
            host = payload
            overlapped_decodes += 1
        if host is not None:
            enc = pipeline.encode_media_arrays(
                params, cfg, *host, mm_chunks=mm_splits, use_flash=use_flash)
        else:
            enc = pipeline.encode_media(
                params, cfg, vid_path, fps=fps, mm_chunks=mm_splits,
                use_flash=use_flash, stream_chunk=stream_chunk)
        img, im, aud, am = enc
        n_stream = ((im.shape[1] if im is not None else 0)
                    + (am.shape[1] if am is not None else 0))
        if chunked_prefill_tokens and n_stream > chunked_prefill_tokens:
            # >2 h-scale streams: the layer-major media_prefill scan carries
            # the full stream next to the growing caches and OOMs (CLAUDE.md
            # 2-h notes); the chunk-major path bounds the peak at caches +
            # one chunk's transients, numerics identical
            media = dattn.media_prefill_chunked(
                params, cfg, img=img, aud=aud, quantize_caches=quantize_kv)
        else:
            media = dattn.media_prefill(
                params, cfg, img=img, img_mask=im, aud=aud, aud_mask=am,
                mm_chunks=mm_splits, use_flash=use_flash,
                quantize_caches=quantize_kv)
        val = (get_media_length(vid_path), im, am, media)
        lru.put(vid_path, val)
        return val + (False,)

    while True:
        if not pending:
            # block for the next request (or EOF)
            while not pending and not eof:
                pull()
            if not pending:
                break
        # drain whatever has already arrived — this is the micro-batch
        # window — then optionally linger for stragglers. The linger wait is
        # ONE bounded window (a deadline, not per-arrival restarts): a slow
        # trickle can't stretch the first response past linger_s.
        while len(pending) < batch_queries * 4 and pull(0):
            pass
        if linger_s > 0:
            deadline = time.monotonic() + linger_s
            while len(pending) < batch_queries * 4:
                left = deadline - time.monotonic()
                if left <= 0 or not pull(left):
                    break

        vid = pending[0]["video"]
        group = [r for r in pending if r.get("video") == vid][:batch_queries]
        bundles = [(vid, group)]
        if batch_videos > 1 and len(group) == 1:
            # cold single-query short-clip mix: bundle more SINGLE-query
            # videos into one generate — each row then carries its own
            # video's caches (stacked on batch), so the decode loop's
            # HBM-bound weight stream amortizes across videos. Multi-query
            # videos keep the batch-1 shared-cache path (duplicating their
            # caches per row would undo the sharing win).
            seen = {vid}
            for r in list(pending):
                if len(bundles) >= min(batch_videos, batch_queries):
                    break
                v = r.get("video")
                if v in seen:
                    continue
                seen.add(v)
                rows = [x for x in pending if x.get("video") == v]
                if len(rows) == 1:
                    bundles.append((v, rows))
        for _, g in bundles:
            for r in g:
                pending.remove(r)
        # the current bundle is off the queue: kick the background host
        # decode of the NEXT pending video so it overlaps this bundle's
        # device encode + generate
        start_ahead()

        ok = []  # (group, length, im, am, media, cached)
        for v, g in bundles:
            try:
                length, im, am, media, cached = encode(v)
                ok.append((g, length, im, am, media, cached))
            except Exception as e:  # noqa: BLE001 — isolate the bad video
                for r in g:
                    emit({"id": r.get("id"), "error": f"media: {e}"})
                    errors += 1
        if not ok:
            continue

        if len(ok) > 1:
            # cross-video stacking needs every video to carry the SAME
            # modality signature (all-or-none per modality across the
            # bundle); mismatched videos requeue to the front — their
            # encodes are already in the LRU, so the retry is cache-hot
            sig = (ok[0][2] is not None, ok[0][3] is not None)
            misfit = [o for o in ok[1:]
                      if (o[2] is not None, o[3] is not None) != sig]
            if misfit:
                ok = [o for o in ok if o is ok[0] or o not in misfit]
                for o in reversed(misfit):
                    pending.extendleft(reversed(o[0]))

        if len(ok) == 1:
            g, length, im, am, media, cached = ok[0]
            rows = [(r, length, cached) for r in g]
        else:
            im, am, media = _stack_media([(o[2], o[3], o[4]) for o in ok])
            rows = [(o[0][0], o[1], o[5]) for o in ok]

        answered = 0
        group = [r for r, _, _ in rows]
        try:
            tasks = [r.get("task", "tr") for r in group]
            ids_list = [
                pipeline.build_prompt_ids(
                    r["query"], tokenizer, cfg.mm_version, length_r,
                    task="mcq" if t == "vqa" else t,
                    options=r.get("options"))
                for (r, length_r, _), t in zip(rows, tasks)]
            prompt, mask = pipeline.build_prompt_batch(ids_list)
            eos = pipeline.pick_eos(cfg, tokenizer)
            kw = dict(img_mask=im, aud_mask=am, media_caches=media,
                      max_new_tokens=max_new_tokens, eos_id=eos,
                      use_flash=use_flash, mm_chunks=mm_splits)
            if temperature > 0:
                # sampling composes with BOTH paths (plain generate and the
                # rejection-sampling speculative loop)
                kw.update(temperature=temperature, top_k=top_k, top_p=top_p,
                          rng=jax.random.fold_in(sample_rng, generate_calls))
            if draft is not None:
                # model-draft speculative decode (e.g. a distilled draft,
                # train/distill.py) — greedy-identical / distribution-exact
                res = speculative_generate(
                    params, cfg, draft[0], draft[1], jnp.asarray(prompt),
                    jnp.asarray(mask), spec_k=spec_k, **kw)
            elif spec_ngram:
                res = speculative_generate(
                    params, cfg, None, None, jnp.asarray(prompt),
                    jnp.asarray(mask), spec_k=spec_k, **kw)
            else:
                res = generate(params, cfg, jnp.asarray(prompt),
                               jnp.asarray(mask), **kw)
            generate_calls += 1
            toks = np.asarray(res.tokens)
            lens = np.asarray(res.lengths)
            for row, ((r, length_r, cached_r), t) in enumerate(
                    zip(rows, tasks)):
                text = tokenizer.decode(toks[row, : lens[row]],
                                        skip_special_tokens=True).strip()
                emit({"id": r.get("id"), "text": text,
                      "parsed": pipeline.parse_task_output(
                          text, "mcq" if t == "vqa" else t, length_r,
                          cfg.mm_version),
                      "video_s": length_r, "cached_media": cached_r})
                served += 1
                answered += 1
        except Exception as e:  # noqa: BLE001 — isolate the failing group;
            # only rows NOT yet answered get an error (no duplicate
            # responses for an id that already succeeded)
            for r in group[answered:]:
                emit({"id": r.get("id"), "error": str(e)})
                errors += 1

    wall = time.perf_counter() - t_start
    return {"served": served, "errors": errors, "wall_s": round(wall, 3),
            "queries_per_s": round(served / wall, 3) if wall else 0.0,
            "generate_calls": generate_calls,
            "media_cache_hits": lru.hits, "media_cache_misses": lru.misses,
            "overlapped_decodes": overlapped_decodes}


def main(argv: Optional[Iterable[str]] = None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model-path", default=None)
    ap.add_argument("--random-weights", default=None)
    ap.add_argument("--in", dest="infile", default=None,
                    help="JSONL request file (default: stdin)")
    ap.add_argument("--out", dest="outfile", default=None,
                    help="JSONL response file (default: stdout)")
    ap.add_argument("--fps", type=float, default=1.0)
    ap.add_argument("--mm-splits", type=int, default=32)
    ap.add_argument("--max-new-tokens", type=int, default=1024)
    ap.add_argument("--batch-queries", type=int, default=4)
    ap.add_argument("--batch-videos", type=int, default=1,
                    help=">1: bundle up to N single-query videos into one "
                         "generate (each row carries its own media caches, "
                         "stacked on batch) — decode amortizes across "
                         "videos in cold short-clip mixes. HBM: the stacked "
                         "caches are the SUM of the videos' caches")
    ap.add_argument("--media-cache", type=int, default=4,
                    help="videos whose media caches stay resident in HBM "
                         "(size to HBM: hour-long bf16 caches are ~4.6 GB "
                         "each at 1.5B scale; use --quantize-kv to halve)")
    ap.add_argument("--linger", type=float, default=0.0, metavar="SECONDS",
                    help="wait this long for more requests before running a "
                         "partial batch (bigger micro-batches, more latency)")
    ap.add_argument("--load-8bit", action="store_true")
    ap.add_argument("--load-8bit-towers", action="store_true")
    ap.add_argument("--load-4bit", action="store_true")
    ap.add_argument("--quantize-kv", action="store_true")
    ap.add_argument("--w8a8-prefill", type=int, default=None)
    ap.add_argument("--stream-chunk", type=int, default=0)
    ap.add_argument("--spec-ngram", action="store_true")
    ap.add_argument("--draft-model-path", default=None,
                    help="small text-only draft checkpoint (e.g. a "
                         "train/distill.py export) for model-draft "
                         "speculative decoding; overrides --spec-ngram")
    ap.add_argument("--spec-k", type=int, default=4)
    ap.add_argument("--decode-ahead", action="store_true",
                    help="background host decode of the next pending video "
                         "under the current bundle's device work. OFF by "
                         "default: measured SLOWER on this 1-core host at "
                         "short generates (GIL contention, see module "
                         "docstring); enable on multi-core hosts / "
                         "long-generate workloads. --stream-chunk overlaps "
                         "within each video instead")
    ap.add_argument("--temperature", type=float, default=0.0,
                    help=">0: sample (temperature -> top-k -> top-p); "
                         "composes with --spec-ngram via rejection sampling")
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--top-p", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chunked-prefill-tokens", type=int, default=131072,
                    help="streams longer than this many tokens prefill "
                         "chunk-major (media_prefill_chunked — the >2 h "
                         "single-chip memory path); 0 disables")
    ap.add_argument("--dtype", choices=["bfloat16", "float32"],
                    default="bfloat16")
    args = ap.parse_args(list(argv) if argv is not None else None)

    import jax.numpy as jnp

    from vidi_tpu.core.compile_cache import setup_compile_cache
    from vidi_tpu.infer.loader import load_model

    setup_compile_cache()

    if args.w8a8_prefill is not None:
        from vidi_tpu.infer import quantize
        quantize.w8a8_min_tokens = args.w8a8_prefill

    params, cfg, tokenizer = load_model(
        args.model_path, args.random_weights,
        dtype=getattr(jnp, args.dtype), load_8bit=args.load_8bit,
        load_8bit_towers=args.load_8bit_towers, load_4bit=args.load_4bit)

    q: "queue.Queue" = queue.Queue()
    instream = open(args.infile) if args.infile else sys.stdin
    t = threading.Thread(target=_reader, args=(instream, q), daemon=True)
    t.start()

    out = open(args.outfile, "w") if args.outfile else sys.stdout

    def emit(obj: dict):
        out.write(json.dumps(obj) + "\n")
        out.flush()

    draft = None
    if args.draft_model_path:
        d_params, d_cfg, _ = load_model(args.draft_model_path,
                                        dtype=getattr(jnp, args.dtype))
        draft = (d_params, d_cfg)

    stats = serve_loop(
        params, cfg, tokenizer, q, emit,
        fps=args.fps, mm_splits=args.mm_splits,
        max_new_tokens=args.max_new_tokens,
        batch_queries=args.batch_queries, batch_videos=args.batch_videos,
        media_cache=args.media_cache,
        quantize_kv=args.quantize_kv, stream_chunk=args.stream_chunk,
        spec_ngram=args.spec_ngram, draft=draft, spec_k=args.spec_k,
        linger_s=args.linger, decode_ahead=args.decode_ahead,
        temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
        seed=args.seed, chunked_prefill_tokens=args.chunked_prefill_tokens)
    print(f"serve: {json.dumps(stats)}", file=sys.stderr)
    if args.outfile:
        out.close()
    if args.infile:
        instream.close()


if __name__ == "__main__":
    main()
