"""Evaluation-harness tests: unit semantics + golden parity against the
reference's shipped prediction files (skipped when the reference tree is
absent)."""
import json
import os

import numpy as np
import pytest

from vidi_tpu.evals import vue_plot, vue_stg, vue_tr

REF = "/root/reference"


# ---------------------------------------------------------------------------
# VUE-TR unit semantics
# ---------------------------------------------------------------------------

def test_merge_time_spans():
    out = vue_tr.merge_time_spans(np.array([[5.0, 7.0], [1.0, 3.0], [3.0, 4.0]]))
    np.testing.assert_allclose(out, [[1, 4], [5, 7]])


def test_overlap_ratio_edges():
    assert vue_tr.overlap_ratio(np.array([]), np.array([])) == 1.0
    assert vue_tr.overlap_ratio(np.array([[1, 2]]), np.array([])) == 0.0
    assert vue_tr.overlap_ratio(np.array([]), np.array([[1, 2]])) == 0.0
    # identical spans -> 1
    assert vue_tr.overlap_ratio(np.array([[1, 3]]), np.array([[1, 3]])) == pytest.approx(1.0)
    # half overlap: pred [0,2], gt [1,3] -> inter 1, union 3
    assert vue_tr.overlap_ratio(np.array([[0, 2]]), np.array([[1, 3]])) == pytest.approx(1 / 3, abs=1e-9)


def test_precision_recall_v1_vs_v2_empty_empty():
    results = [{"gt": [], "answer": np.array([])}]
    p2, _ = vue_tr.compute_precision_recall(results, avg=False, v1=False)
    p1, _ = vue_tr.compute_precision_recall(results, avg=False, v1=True)
    assert list(p2) == [1.0] and list(p1) == []


# ---------------------------------------------------------------------------
# VUE-STG unit semantics
# ---------------------------------------------------------------------------

def test_quantize_round_half_up():
    assert vue_stg.quantize_time_ms(499) == 0
    assert vue_stg.quantize_time_ms(500) == 1000
    assert vue_stg.quantize_time_ms(1499) == 1000
    assert vue_stg.quantize_time_ms(1500) == 2000


def test_union_area_vs_grid():
    rects = [(0.0, 0.0, 0.5, 0.5), (0.25, 0.25, 0.75, 0.75), (0.6, 0.0, 0.9, 0.2)]
    got = vue_stg.union_area(rects)
    # brute force on a fine grid
    n = 400
    xs = (np.arange(n) + 0.5) / n
    grid = np.zeros((n, n), bool)
    for x0, y0, x1, y1 in rects:
        grid |= (xs[:, None] > x0) & (xs[:, None] < x1) & (xs[None, :] > y0) & (xs[None, :] < y1)
    approx = grid.mean()
    assert abs(got - approx) < 5e-3


def test_compare_tubes_simple():
    gt = vue_stg.Tube()
    pred = vue_stg.Tube()
    gt.add_bbox(1000, (0.0, 0.0, 0.5, 0.5))
    gt.add_bbox(2000, (0.0, 0.0, 0.5, 0.5))
    pred.add_bbox(1000, (0.0, 0.0, 0.5, 0.5))  # perfect on frame 1
    pred.add_bbox(3000, (0.0, 0.0, 0.5, 0.5))  # spurious frame
    m = vue_stg.compare_tubes(gt, pred)
    assert m["t_iou"] == pytest.approx(1 / 3)
    assert m["t_recall"] == pytest.approx(1 / 2)
    assert m["t_precision"] == pytest.approx(1 / 2)
    assert m["v_iou_int"] == pytest.approx(1.0, abs=1e-9)


def test_sanitize_bbox_swaps_and_clamps():
    assert vue_stg.sanitize_bbox((0.9, 1.5, 0.1, -0.2)) == (0.1, 0.0, 0.9, 1.0)


# ---------------------------------------------------------------------------
# VUE-PLOT unit semantics
# ---------------------------------------------------------------------------

def test_wer_basic():
    assert vue_plot.wer("a b c", "a b c") == 0.0
    assert vue_plot.wer("a b c", "a x c") == pytest.approx(1 / 3)
    assert vue_plot.wer("a b c", "") == pytest.approx(1.0)
    assert vue_plot.wer("a", "a b b b") == pytest.approx(3.0)  # unclamped


def test_compare_transcripts_fixture():
    S = vue_plot.Segment
    gt = [S(0.0, 10.0, "hello world", [
        {"timestamp": 5.0, "box_2d": [0.0, 0.0, 0.5, 0.5]}])]
    pred = [S(1.0, 10.0, "hello world", [
        {"timestamp": 5.01, "box_2d": [0.0, 0.0, 0.5, 0.5]}])]
    out = vue_plot.compare_transcripts(pred, gt)["metrics"]
    assert out["matched_segments"] == 1
    assert out["temporal_iou_avg"] == pytest.approx(0.9)
    assert out["word_error_rate"] == 0.0
    assert out["average_box_iou"] == pytest.approx(1.0)
    # box outside the 20ms tolerance is not matched
    pred2 = [S(1.0, 10.0, "hello world", [
        {"timestamp": 5.5, "box_2d": [0.0, 0.0, 0.5, 0.5]}])]
    out2 = vue_plot.compare_transcripts(pred2, gt)["metrics"]
    assert out2["average_box_iou"] == 0


def test_box_norm_0_1000():
    items = [{"start": 0, "end": 1, "boxes": [
        {"timestamp": 0.5, "box_2d": [100, 200, 500, 900]}]}]
    vue_plot._norm_boxes(items)
    assert items[0]["boxes"][0]["box_2d"] == [0.1, 0.2, 0.5, 0.9]


def test_extract_answer():
    assert vue_plot.extract_answer("<answer> B </answer>") == "B"
    assert vue_plot.extract_answer("Cats") == "C"


# ---------------------------------------------------------------------------
# Golden parity vs shipped reference results
# ---------------------------------------------------------------------------

needs_ref = pytest.mark.skipif(not os.path.isdir(REF), reason="reference absent")


@needs_ref
def test_golden_vue_tr_v2_vidi2():
    res = vue_tr.evaluate(
        f"{REF}/VUE_TR_V2/results_Vidi2.json",
        f"{REF}/VUE_TR_V2/VUE-TRv2_ground_truth.json", breakdown=False)
    o = res["overall"]
    assert res["n_query"] == 1600
    assert round(o["iou"] * 100, 2) == 48.75       # results_table.csv:35
    assert round(o["precision"] * 100, 2) == 62.45
    assert round(o["recall"] * 100, 2) == 64.93


@needs_ref
def test_golden_vue_tr_v1_vidi():
    res = vue_tr.evaluate(
        f"{REF}/VUE_TR/results_Vidi.json",
        f"{REF}/VUE_TR/VUE-TR_ground_truth.json", v1=True, breakdown=False)
    o = res["overall"]
    assert res["n_query"] == 1598
    assert round(o["iou"] * 100, 1) == 35.4        # VUE_TR/results_table.csv:2
    assert round(o["precision"] * 100, 1) == 49.0
    assert round(o["recall"] * 100, 1) == 52.5


@needs_ref
def test_golden_vue_plot_vqa_vidi25():
    out = vue_plot.evaluate_vqa(
        f"{REF}/VUE_PLOT/Reasoning_VQA/Reasoning_VQA_results_Vidi-2.5-think.json")
    assert round(out["overall_accuracy"], 2) == 64.33  # readme.md:82
    audio = out["per_task"]["Speech, Audio, and Sound Effect Reasoning"]
    assert round(audio["accuracy"], 2) == 74.43


@needs_ref
@pytest.mark.slow
def test_golden_vue_stg_vidi2():
    ev = vue_stg.SpatioTemporalEvaluator(step_ms=1000)
    ev.load_dataset(f"{REF}/VUE_STG/vue-stg-benchmark")
    df = ev.evaluate_pred_file(f"{REF}/VUE_STG/results/vidi2/tubes.csv",
                               ignore_missing_pred=False)
    s = vue_stg.summarize(df)
    overall = s[s["category"] == "overall"].iloc[0]
    # VUE_STG/README.md:24
    assert round(float(overall["t_IoU"]), 3) == 0.532
    assert round(float(overall["t_Precision"]), 3) == 0.730
    assert round(float(overall["t_Recall"]), 3) == 0.598
    assert round(float(overall["v_IoU"]), 3) == 0.326
    assert round(float(overall["v_IoU_Int"]), 3) == 0.603


def test_parse_stg_tubes():
    from vidi_tpu.infer.run_benchmark import parse_stg_tubes

    text = "0.100-0.102: 0.2,0.1,0.8,0.9; 0.500-0.500: 200,100,800,900"
    rows = parse_stg_tubes(text, duration_s=1000.0)
    # segment 1: 100s..102s -> 3 rows at 1s quantization
    seg1 = [r for r in rows if r[0] < 200000]
    assert len(seg1) == 3 and seg1[0][0] == 100000
    assert seg1[0][1] == (0.2, 0.1, 0.8, 0.9)
    # segment 2: 0-1000 coords normalized to 0-1
    seg2 = [r for r in rows if r[0] == 500000]
    assert seg2 and seg2[0][1] == (0.2, 0.1, 0.8, 0.9)


def test_run_vqa_emits_vqa_eval_input(tmp_path):
    """run_benchmark --task vqa: GT MCQ records -> records + pred_answer
    (the reference vqa_eval.py input), with the GT's "A. " option letters
    stripped before the mcq prompt re-letters them."""
    import argparse
    import json as _json

    from vidi_tpu.infer.run_benchmark import run_vqa

    gts = [
        {"problem_id": 1, "video_id": "vidA", "problem": "Who speaks?",
         "options": ["A. Alice", "B. Bob"], "answer": "A",
         "task_type": "Perception and Understanding"},
        {"problem_id": 2, "video_id": "vidA", "problem": "What color?",
         "options": ["A. Red", "B. Blue"], "answer": "B",
         "task_type": "Perception and Understanding"},
        {"problem_id": 3, "video_id": "vidB", "problem": "Where?",
         "options": ["A. Paris", "B. Rome"], "answer": "B",
         "task_type": "Narrative and Structural Understanding"},
    ]
    gt_path = tmp_path / "vqa.json"
    gt_path.write_text(_json.dumps(gts))
    out_path = tmp_path / "pred.json"
    args = argparse.Namespace(gt=str(gt_path), out=str(out_path), limit=0,
                              video_dir=str(tmp_path), video_ext=".mp4",
                              batch_queries=4)

    seen = []

    def fake_ask_batch(queries, vid_path, options=None):
        seen.append((vid_path, list(queries), list(options)))
        return 10.0, [f"<answer>{chr(65 + i)}</answer>"
                      for i in range(len(queries))]

    run_vqa(args, fake_ask_batch)
    out = _json.loads(out_path.read_text())
    assert len(out) == 3
    by_id = {r["problem_id"]: r for r in out}
    assert by_id[1]["pred_answer"] == "A" and by_id[2]["pred_answer"] == "B"
    assert by_id[1]["answer"] == "A" and "options" in by_id[1]
    assert "_options" not in by_id[1] and "query" not in by_id[1]
    # same-video queries batched into one call; letters stripped
    vids = [os.path.basename(v) for v, _, _ in seen]
    assert vids == ["vidA.mp4", "vidB.mp4"]
    assert seen[0][2][0] == ["Alice", "Bob"]

    # the produced file scores cleanly in the vqa harness
    from vidi_tpu.evals.vue_plot import evaluate_vqa
    res = evaluate_vqa(str(out_path))
    assert res["total"] == 3
    assert res["overall_accuracy"] == pytest.approx(100 * 2 / 3)


def test_parse_character_segments():
    from vidi_tpu.infer.tasks import parse_character

    text = ('0.100-0.200: "hello there" [0.100: 0.1,0.2,0.3,0.4; '
            '0.150: 100,200,300,400]\n0.500-0.600: "bye" []')
    segs = parse_character(text, duration=100.0)
    assert len(segs) == 2
    assert segs[0]["start"] == 10.0 and segs[0]["end"] == 20.0
    assert segs[0]["text"] == "hello there"
    assert len(segs[0]["boxes"]) == 2
    assert segs[0]["boxes"][0] == {"timestamp": 10.0,
                                   "box_2d": [0.1, 0.2, 0.3, 0.4]}
    # 0-1000 coords normalized down (character_eval.py:293-295)
    assert segs[0]["boxes"][1]["box_2d"] == [0.1, 0.2, 0.3, 0.4]
    assert segs[1]["boxes"] == [] and segs[1]["text"] == "bye"


def test_run_character_emits_character_eval_input(tmp_path):
    """run_benchmark --task character output scores in evaluate_character
    (the self-contained gt+pred record format of character_eval.py)."""
    import argparse
    import json as _json

    from vidi_tpu.infer.run_benchmark import run_character

    gt_segs = [{"start": 10.0, "end": 20.0, "text": "hello there",
                "boxes": [{"timestamp": 10.0, "box_2d": [0.1, 0.2, 0.3, 0.4]}]}]
    gts = [{"query_id": "q1", "video_id": "vidA", "character": "Alice",
            "duration": 100.0, "gt": gt_segs}]
    gt_path = tmp_path / "char.json"
    gt_path.write_text(_json.dumps(gts))
    out_path = tmp_path / "pred.json"
    args = argparse.Namespace(gt=str(gt_path), out=str(out_path), limit=0,
                              video_dir=str(tmp_path), video_ext=".mp4",
                              batch_queries=4)

    def fake_ask_batch(queries, vid_path, options=None):
        return 100.0, ['0.100-0.200: "hello there" '
                       '[0.100: 0.1,0.2,0.3,0.4]'] * len(queries)

    run_character(args, fake_ask_batch)
    out = _json.loads(out_path.read_text())
    assert out[0]["pred"][0]["text"] == "hello there"
    assert out[0]["gt"] == gt_segs

    from vidi_tpu.evals.vue_plot import evaluate_character
    res = evaluate_character(str(out_path))
    # perfect match: tIoU 1, box IoU 1, WER 0
    assert res["temporal_iou_avg"] == pytest.approx(1.0)
    assert res["average_box_iou"] == pytest.approx(1.0)
    assert res["word_error_rate"] == pytest.approx(0.0)
    assert res["matched_segments"] == 1


def test_visualize_draw_tubes(tmp_path):
    from vidi_tpu.evals.visualize import collect_boxes_by_frame, draw_tubes_video

    segs = [{"text": "alice",
             "boxes": [{"timestamp": 0.0, "box_2d": [0.1, 0.1, 0.5, 0.5]},
                       {"timestamp": 1.0, "box_2d": [0.2, 0.2, 0.6, 0.6]}]}]
    by_frame = {}
    collect_boxes_by_frame(segs, duration=1.0, fps=5, frame_count=10,
                           width=100, height=100, color=(0, 0, 255),
                           caption_prefix="p", boxes_by_frame=by_frame,
                           interpolate=True)
    # endpoints at frames 0 and 5, interpolation fills 1..4
    assert set(by_frame) == {0, 1, 2, 3, 4, 5}
    mid = by_frame[2][0]
    assert abs(mid["x0"] - (10 + 0.4 * 10)) < 1e-6  # linear between 10 and 20

    # end-to-end render on a tiny synthetic clip
    import sys, subprocess
    vid = tmp_path / "clip.mp4"
    sys.path.insert(0, "scripts")
    from make_example import make_video
    make_video(str(vid), seconds=2, fps=5, size=64)
    out = tmp_path / "viz.mp4"
    n = draw_tubes_video(str(vid), str(out), segs, gt_segments=segs,
                         max_frames=8)
    assert n > 0 and out.exists() and out.stat().st_size > 0


def test_extract_answer_empty_and_bare():
    """Empty model output must not crash MCQ parsing (pipeline --task mcq)."""
    from vidi_tpu.evals.vue_plot import extract_answer

    assert extract_answer("") == ""
    # reference scores text[0] verbatim — leading whitespace stays a
    # (wrong) whitespace answer (VUE_PLOT/character_eval.py:252)
    assert extract_answer("   ") == " "
    assert extract_answer(" B) late") == " "
    assert extract_answer("B) the red car") == "B"
    assert extract_answer("<answer> C </answer>") == "C"
