"""E2E capability loop with learning: train -> export -> reload -> infer ->
score (scripts/full_loop_smoke.py). The one arc that exercises L1 data,
L6 train+infer drivers, and the L7 evaluator together, mirroring the
reference's finetune smoke recipe (Vidi1.5_9B/README.md:20-28 +
example.json)."""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


@pytest.mark.slow
def test_train_export_infer_score_loop(tmp_path):
    from full_loop_smoke import run_full_loop

    scores = run_full_loop(str(tmp_path), steps=300, copies=8,
                           verbose=False)
    # a converged memorization run scores ~0.995 IoU (span rounding only);
    # anything > 0.5 proves the exported weights carried the learned
    # behavior through reload + the runner's prompt/parse path
    assert scores["overall"]["iou"] > 0.5, scores
    assert scores["n_query"] == 1
