"""End-to-end multi-chip runner: `run_benchmark --task tr` driven through
main() on the forced 8-device CPU mesh (conftest), for each of the CLI's
parallel modes, must produce predictions identical to the single-device run
(run_benchmark.py:271-295 mesh construction -> sharded load_model ->
set_mesh -> ask_batch wiring)."""
import json
import os
import sys

import pytest

REF_VIDEO_DIR = "/root/reference/Vidi1.5_9B"


def _gt(tmp_path):
    gts = [
        {"query_id": f"q{i}", "video_id": "dummy", "duration": 25.0,
         "query": q, "task": "temporal_retrieval"}
        for i, q in enumerate(["a moving gradient", "a red square",
                               "the opening shot"])
    ]
    p = tmp_path / "gt.json"
    p.write_text(json.dumps(gts))
    return str(p)


def _run(tmp_path, gt, name, extra, capsys):
    from vidi_tpu.infer import run_benchmark
    from vidi_tpu.parallel import sharding

    out = str(tmp_path / f"{name}.json")
    argv = ["run_benchmark", "--task", "tr", "--gt", gt,
            "--video-dir", REF_VIDEO_DIR, "--out", out,
            "--random-weights", "tiny", "--max-new-tokens", "8",
            "--batch-queries", "2", "--dtype", "float32"] + extra
    old = sys.argv
    try:
        sys.argv = argv
        run_benchmark.main()
    finally:
        sys.argv = old
        sharding.set_mesh(None)  # process-wide mesh must not leak
    # a sharded-path crash is swallowed by ask_group's per-query fallback;
    # the captured output proves the mesh path really executed
    captured = capsys.readouterr().out
    assert "retrying queries individually" not in captured, captured
    with open(out) as f:
        return json.load(f)


@pytest.mark.slow
@pytest.mark.parametrize("extra", [
    ["--seq-parallel", "2", "--data-parallel", "2"],
    ["--model-parallel", "2"],
    # not a mesh mode: the speculative serving path must be output-identical
    ["--spec-ngram", "--spec-k", "3"],
], ids=["seq2xdp2", "tp2", "specngram"])
def test_run_benchmark_tr_multichip_matches_single(tmp_path, extra, capsys):
    if not os.path.exists(os.path.join(REF_VIDEO_DIR, "dummy.mp4")):
        pytest.skip("reference dummy.mp4 not present")
    gt = _gt(tmp_path)
    single = _run(tmp_path, gt, "single", [], capsys)
    multi = _run(tmp_path, gt, "multi", extra, capsys)
    assert len(single) == 3
    assert multi == single
