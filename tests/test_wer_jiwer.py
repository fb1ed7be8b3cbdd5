"""Cross-checks for the character-grounding WER scorer (verdict item 8).

The reference scores WER via jiwer (VUE_PLOT/character_eval.py:165-187);
this env can't install jiwer, so agreement is pinned two ways:
1. vendored test vectors whose jiwer outputs are documented/known
   (jiwer's default pipeline: collapse whitespace, strip, split on spaces,
   word-level Levenshtein / reference length);
2. a structurally different edit-distance oracle (full O(nm) matrix, not
   the scorer's rolling rows) fuzzed over random corpora.

Plus a synthetic golden for the eval_summary.txt writer matching the
shipped Character_Grounding/results/eval_summary.txt format byte for byte.
"""
import json

import numpy as np
import pytest

from vidi_tpu.evals import vue_plot


# ---------------------------------------------------------------------------
# 1. vendored jiwer vectors
# ---------------------------------------------------------------------------

# (reference, hypothesis, jiwer.wer) — from jiwer's documentation/tests
JIWER_VECTORS = [
    ("hello world", "hello duck", 0.5),
    ("the quick brown fox", "the quick brown dog", 0.25),
    ("this is a test", "this is a test", 0.0),
    ("this is a test", "this is", 0.5),              # 2 deletions / 4
    # insert "what" + substitute monthy->is = 2 edits / 4 ref words
    ("i like monthy python", "what i like is python", 0.5),
    ("a b c", "a b c d", 1.0 / 3),                   # insertion counts
    ("one", "two three four", 3.0),                  # unclamped > 1
    ("  spaced   out  words ", "spaced out words", 0.0),  # whitespace pipeline
]


@pytest.mark.parametrize("ref,hyp,expected", JIWER_VECTORS)
def test_wer_matches_vendored_jiwer_outputs(ref, hyp, expected):
    assert vue_plot.wer(ref, hyp) == pytest.approx(expected)


# ---------------------------------------------------------------------------
# 2. independent-oracle fuzz
# ---------------------------------------------------------------------------

def _edit_distance_matrix(a, b):
    """Full-matrix Levenshtein, written independently of vue_plot.wer's
    rolling-row form."""
    n, m = len(a), len(b)
    d = np.zeros((n + 1, m + 1), np.int32)
    d[:, 0] = np.arange(n + 1)
    d[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                          d[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
    return int(d[n, m])


def test_wer_fuzz_against_independent_oracle():
    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(12)]
    for _ in range(200):
        ref = list(rng.choice(vocab, size=rng.integers(1, 15)))
        hyp = list(rng.choice(vocab, size=rng.integers(0, 15)))
        want = _edit_distance_matrix(ref, hyp) / len(ref)
        got = vue_plot.wer(" ".join(ref), " ".join(hyp))
        assert got == pytest.approx(want), (ref, hyp)


def test_wer_empty_reference_semantics():
    # jiwer raises on empty reference; the scorer's _clamped_wer guards the
    # `if gt_corpus` branch exactly like the reference (-> 1.0)
    assert vue_plot._clamped_wer("", "anything") == 1.0
    assert vue_plot._clamped_wer("", "") == 1.0
    # clamping mirrors character_eval.py:202-204 (wer clipped into [0, 1])
    assert vue_plot._clamped_wer("one", "two three four") == 1.0


# ---------------------------------------------------------------------------
# 3. eval_summary.txt golden (format of the shipped
#    Character_Grounding/results/eval_summary.txt)
# ---------------------------------------------------------------------------

def _mk_query(qid, gt, pred):
    return {"query_id": qid, "video_id": f"v{qid}", "query": "who?",
            "duration": 10.0, "gt": gt, "pred": pred}


def test_eval_summary_golden(tmp_path):
    seg = lambda s, e, text, boxes=():  {"start": s, "end": e, "text": text,
                                         "boxes": list(boxes)}
    box = lambda t, b: {"timestamp": t, "box_2d": b}
    data = [
        # exact match incl. one timestamp-matched box pair (IoU 0.25)
        _mk_query(1,
                  [seg(0, 2, "the red car", [box(1.0, [0, 0, 200, 200])])],
                  [seg(0, 2, "the red car", [box(1.005, [0, 0, 100, 100])])]),
        # temporal IoU 0.5 match, one word substituted out of three
        _mk_query(2, [seg(0, 4, "a b c")], [seg(0, 8, "a x c")]),
        # no overlap >= 0.5 -> no matches
        _mk_query(3, [seg(0, 1, "hello")], [seg(5, 6, "hello")]),
    ]
    inp = tmp_path / "preds.json"
    inp.write_text(json.dumps(data))

    out = vue_plot.evaluate_character(str(inp))
    path = vue_plot.write_summary(out, str(tmp_path))
    got = open(path).read()

    # hand-computed via the reference formulas (character_eval.py:165-215):
    # q1: tIoU 1.0, box IoU (100*100)/(200*200)=0.25, WER 0
    # q2: tIoU 0.5, WER 1/3, overall word acc 2/3
    # q3: no matches -> tIoU 0, WER 1.0, overall acc 0 (hello vs hello at
    #     different times still matches overall text) -> overall_wer 0
    want = (
        "Evaluation Summary:\n"
        "===================\n"
        f"temporal_iou_avg: {(1.0 + 0.5 + 0.0) / 3:.4f}\n"
        f"average_box_iou: {(0.25 + 0.0 + 0.0) / 3:.4f}\n"
        f"word_error_rate: {(0.0 + 1/3 + 1.0) / 3:.4f}\n"
        f"overall_word_accuracy: {(1.0 + 2/3 + 1.0) / 3:.4f}\n"
        f"overall_word_error: {(0.0 + 1/3 + 0.0) / 3:.4f}\n"
        "total_gt_segments: 3.0000\n"
        "total_pred_segments: 3.0000\n"
        "matched_segments: 2.0000\n"
        "\nTotal Questions: 3\n"
    )
    assert got == want
