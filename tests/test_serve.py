"""Serving daemon (`infer/serve.py`): response parity with the single-query
pipeline, media-cache LRU accounting, micro-batch grouping, per-request
error isolation, and the speculative path through the loop.

No reference equivalent (its serving story is one-shot batch scripts,
eval/inference.py); parity anchor is `pipeline.ask` on the same inputs.
"""
import json
import os
import queue
import shutil

import jax.numpy as jnp
import pytest

DUMMY = "/root/reference/Vidi1.5_9B/dummy.mp4"

pytestmark = pytest.mark.skipif(not os.path.exists(DUMMY),
                                reason="reference dummy.mp4 not present")


@pytest.fixture(scope="module")
def model():
    from vidi_tpu.infer.loader import load_model
    return load_model(None, "tiny", dtype=jnp.float32)


def _serve(model, reqs, **kw):
    from vidi_tpu.infer.serve import serve_loop
    params, cfg, tokenizer = model
    q = queue.Queue()
    for r in reqs:
        q.put(r)
    q.put(None)
    out = []
    stats = serve_loop(params, cfg, tokenizer, q, out.append,
                       max_new_tokens=8, mm_splits=4, **kw)
    return out, stats


def test_serve_matches_pipeline_ask(model):
    params, cfg, tokenizer = model
    from vidi_tpu.infer import pipeline

    queries = ["a red square", "the opening shot", "a moving gradient"]
    reqs = [{"id": f"q{i}", "video": DUMMY, "query": qy}
            for i, qy in enumerate(queries)]
    out, stats = _serve(model, reqs, batch_queries=2)

    assert stats["served"] == 3 and stats["errors"] == 0
    # one video: encoded once, the second group hits the cache
    assert stats["media_cache_misses"] == 1
    assert stats["media_cache_hits"] == 1
    by_id = {o["id"]: o for o in out}
    for i, qy in enumerate(queries):
        want = pipeline.ask(qy, DUMMY, params, cfg, tokenizer,
                            max_new_tokens=8, mm_chunks=4)
        got = by_id[f"q{i}"]
        assert got["parsed"] == want, (qy, got, want)
        assert got["video_s"] > 0
    # grouping: first batch encodes, rows 3+ reuse (cached_media flag)
    assert [by_id[f"q{i}"]["cached_media"] for i in range(3)] == [
        False, False, True]


@pytest.mark.slow  # six encodes of dummy.mp4
def test_serve_lru_eviction(model, tmp_path):
    vid_b = str(tmp_path / "dummy_b.mp4")
    shutil.copyfile(DUMMY, vid_b)
    reqs = [{"id": str(i), "video": v, "query": "x"}
            for i, v in enumerate([DUMMY, vid_b, DUMMY, vid_b])]

    # capacity 1 + batch 1: strict alternation evicts every time
    out, stats = _serve(model, reqs, batch_queries=1, media_cache=1)
    assert stats["served"] == 4
    assert stats["media_cache_misses"] == 4
    assert stats["media_cache_hits"] == 0

    # capacity 2: both videos stay resident after the first pass
    out, stats = _serve(model, reqs, batch_queries=1, media_cache=2)
    assert stats["media_cache_misses"] == 2
    assert stats["media_cache_hits"] == 2


@pytest.mark.slow  # heavy integration; fast gate keeps a representative
def test_serve_error_isolation_and_spec(model):
    reqs = [
        {"id": "bad", "video": "/nonexistent/clip.mp4", "query": "x"},
        {"id": "novideo", "query": "missing the video field"},
        {"id": "ok", "video": DUMMY, "query": "a red square"},
    ]
    out, stats = _serve(model, reqs, spec_ngram=True, spec_k=3)
    by_id = {o["id"]: o for o in out}
    assert "error" in by_id["bad"]
    assert "error" in by_id["novideo"]  # rejected at intake, loop survives
    assert "parsed" in by_id["ok"]
    assert stats["served"] == 1 and stats["errors"] == 2
    # every id answered exactly once (no duplicate success+error rows)
    assert len(out) == len(reqs)

    # speculative response == plain greedy response (the invariance, at the
    # daemon level)
    plain, _ = _serve(model, [reqs[2]])
    assert by_id["ok"]["text"] == plain[0]["text"]


@pytest.mark.slow  # heavy integration; fast gate keeps a representative
def test_serve_cross_video_batching(model, tmp_path):
    """--batch-videos: two single-query videos of DIFFERENT lengths ride
    ONE generate call with their media caches S-padded and stacked on
    batch; responses identical to the unbatched run (padding/stacking must
    not leak across rows)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "make_example", os.path.join(os.path.dirname(__file__), "..",
                                     "scripts", "make_example.py"))
    mex = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mex)
    vid_b = str(tmp_path / "short_b.mp4")
    mex.make_video(vid_b, seconds=10)  # vs dummy.mp4's 25 s: S_img differs
    reqs = [{"id": "a", "video": DUMMY, "query": "a red square"},
            {"id": "b", "video": vid_b, "query": "the opening shot"}]

    base, base_stats = _serve(model, reqs, batch_videos=1)
    assert base_stats["generate_calls"] == 2
    got, stats = _serve(model, reqs, batch_videos=2)
    assert stats["generate_calls"] == 1
    assert stats["served"] == 2
    key = lambda os_: {o["id"]: (o["text"], o["parsed"]) for o in os_}
    assert key(got) == key(base)

    # a multi-query video keeps the batch-1 shared-cache path: it is never
    # bundled (duplicating its caches per row would undo the sharing win)
    reqs3 = [{"id": "a1", "video": DUMMY, "query": "a red square"},
             {"id": "a2", "video": DUMMY, "query": "the opening shot"},
             {"id": "b", "video": vid_b, "query": "a moving gradient"}]
    got3, stats3 = _serve(model, reqs3, batch_videos=2)
    assert stats3["generate_calls"] == 2 and stats3["served"] == 3


@pytest.mark.slow  # heavy integration; fast gate keeps a representative
def test_serve_decode_ahead_matches(model, tmp_path):
    """While video A generates, video B host-decodes on the background
    thread; responses must equal the non-overlapped run (decode-ahead feeds
    the same encode_media_arrays split encode_media uses internally)."""
    vid_b = str(tmp_path / "dummy_b.mp4")
    shutil.copyfile(DUMMY, vid_b)
    reqs = [{"id": "a", "video": DUMMY, "query": "a red square"},
            {"id": "b", "video": vid_b, "query": "the opening shot"}]

    base, base_stats = _serve(model, reqs, batch_queries=1)
    assert base_stats["overlapped_decodes"] == 0  # off by default (measured
    # slower on the 1-core host at short generates; see serve.py docstring)
    got, stats = _serve(model, reqs, batch_queries=1, decode_ahead=True)
    assert stats["overlapped_decodes"] == 1  # vid_b decoded under A's turn
    key = lambda os_: {o["id"]: (o["text"], o["parsed"]) for o in os_}
    assert key(got) == key(base)


@pytest.mark.slow  # heavy integration; fast gate keeps a representative
def test_serve_linger_is_one_bounded_window(model):
    """The --linger wait is a single deadline-bounded window: each straggler
    arrival shrinks the remaining wait (timeouts passed to Queue.get must be
    strictly decreasing), instead of restarting a full linger period."""
    import time
    from collections import deque

    class TrickleQueue:
        """Blocking get -> next item (None=EOF at exhaustion); get_nowait
        always Empty (forces the linger path); timed get records the
        requested timeout, burns 50 ms, then yields the next item."""

        def __init__(self, items):
            self.items = deque(items)
            self.timeouts = []

        def get(self, timeout=None):
            if timeout is None:
                return self.items.popleft() if self.items else None
            self.timeouts.append(timeout)
            time.sleep(0.05)
            if self.items:
                return self.items.popleft()
            raise queue.Empty

        def get_nowait(self):
            raise queue.Empty

    params, cfg, tokenizer = model
    reqs = [{"id": f"q{i}", "video": DUMMY, "query": "a red square"}
            for i in range(4)]
    q = TrickleQueue(reqs)
    out = []
    stats = serve_stats = None
    from vidi_tpu.infer.serve import serve_loop
    stats = serve_loop(params, cfg, tokenizer, q, out.append,
                       max_new_tokens=8, mm_splits=4, batch_queries=2,
                       linger_s=0.3)
    assert stats["served"] == 4
    ts = q.timeouts
    assert len(ts) >= 2
    assert all(t <= 0.3 + 1e-6 for t in ts), ts
    # split at window resets (each batching cycle opens one fresh window);
    # WITHIN a window the remaining time must strictly shrink — the old
    # restart-per-arrival bug passed the constant full linger every time
    windows, cur = [], [ts[0]]
    for t in ts[1:]:
        if t < cur[-1]:
            cur.append(t)
        else:
            windows.append(cur)
            cur = [t]
    windows.append(cur)
    assert any(len(w) >= 3 for w in windows), ts  # stragglers did arrive
    for w in windows:
        assert all(b < a for a, b in zip(w, w[1:])), ts
        # a window's arrivals cost real time, so its LAST remaining-time
        # must be well under the full linger period
        if len(w) >= 3:
            assert w[-1] < 0.3 - 0.05, ts


@pytest.mark.slow  # heavy integration; fast gate keeps a representative
def test_serve_mixed_modality_bundle_requeues(model, tmp_path, monkeypatch):
    """--batch-videos: a video missing a modality cannot stack with one that
    has it (all-or-none per modality across a bundle). The mismatched video
    must requeue and serve separately — correct answers for both, never a
    silently dropped modality."""
    from vidi_tpu.infer import pipeline as pl
    vid_b = str(tmp_path / "noaudio_b.mp4")
    shutil.copyfile(DUMMY, vid_b)
    real = pl.encode_media

    def patched(params, cfg, vid_path, **kw):
        img, im, aud, am = real(params, cfg, vid_path, **kw)
        if vid_path == vid_b:  # simulate an audio-less container
            return img, im, None, None
        return img, im, aud, am

    monkeypatch.setattr(pl, "encode_media", patched)
    reqs = [{"id": "a", "video": DUMMY, "query": "a red square"},
            {"id": "b", "video": vid_b, "query": "the opening shot"}]
    out, stats = _serve(model, reqs, batch_videos=2, decode_ahead=False)
    by_id = {o["id"]: o for o in out}
    assert "parsed" in by_id["a"] and "parsed" in by_id["b"], out
    assert stats["served"] == 2 and stats["errors"] == 0
    assert stats["generate_calls"] == 2  # b re-served solo, LRU-hot
    assert stats["media_cache_hits"] == 1


@pytest.mark.slow  # heavy integration; fast gate keeps a representative
def test_serve_chunked_prefill_matches(model):
    """chunked_prefill_tokens routing: forcing the chunk-major stream
    prefill (the >2 h single-chip memory path) must produce identical
    responses to the default layer-major media_prefill."""
    reqs = [{"id": "a", "video": DUMMY, "query": "a red square"}]
    base, _ = _serve(model, reqs)
    got, _ = _serve(model, reqs, chunked_prefill_tokens=1)
    assert [(o["id"], o["text"], o["parsed"]) for o in got] == \
           [(o["id"], o["text"], o["parsed"]) for o in base]


@pytest.mark.slow  # heavy integration; fast gate keeps a representative
@pytest.mark.slow  # heavy integration; fast gate keeps a representative
def test_serve_model_draft_matches_plain(model):
    """Model-draft speculative decoding through the daemon: responses must
    equal plain greedy serving for ANY draft (here a random-init tiny
    draft — near-zero acceptance, identical output)."""
    import dataclasses

    import jax

    from vidi_tpu.models import dattn

    params, cfg, tokenizer = model
    t = dataclasses.replace(cfg.text, num_layers=2, hidden_size=32,
                            num_heads=2, num_kv_heads=1, head_dim=8,
                            intermediate_size=64)
    dcfg = dataclasses.replace(cfg, text=t)
    draft = dattn.init_params(jax.random.PRNGKey(9), dcfg, jnp.float32)

    reqs = [{"id": "a", "video": DUMMY, "query": "a red square"},
            {"id": "b", "video": DUMMY, "query": "the opening shot"}]
    base, _ = _serve(model, reqs)
    got, stats = _serve(model, reqs, draft=(draft, dcfg), spec_k=3)
    assert stats["served"] == 2 and stats["errors"] == 0
    key = lambda os_: {o["id"]: (o["text"], o["parsed"]) for o in os_}
    assert key(got) == key(base)


def test_serve_cli_roundtrip(model, tmp_path):
    """main(): file in -> file out through the real argv surface."""
    from vidi_tpu.infer import serve
    req = tmp_path / "req.jsonl"
    resp = tmp_path / "resp.jsonl"
    req.write_text(
        json.dumps({"id": "a", "video": DUMMY, "query": "a red square"})
        + "\nnot json\n123\n")  # bad JSON + valid-JSON non-object
    serve.main(["--random-weights", "tiny", "--dtype", "float32",
                "--in", str(req), "--out", str(resp),
                "--max-new-tokens", "8", "--mm-splits", "4"])
    lines = [json.loads(x) for x in resp.read_text().splitlines()]
    by_id = {o["id"]: o for o in lines}
    assert "text" in by_id["a"]
    assert "error" in by_id[None]  # the bad line answered, loop survived
