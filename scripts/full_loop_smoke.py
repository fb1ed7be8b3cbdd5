"""Full capability loop in one command: train -> export -> infer -> score.

The E2E arc the reference demonstrates with its finetune smoke recipe
(reference: Vidi1.5_9B/README.md:20-28 + example.json — 48 copies of one
conversation over the bundled dummy.mp4): synthesize the fixture, finetune a
tiny Dattn until it memorizes the fixture's TR answer ("0.000-1.000"),
export to HF format, reload the exported checkpoint through the benchmark
runner, and score the predictions with the VUE-TR evaluator to a nonzero
IoU — L1 data -> L6 drivers -> L7 eval with learning in the loop.

    python scripts/full_loop_smoke.py [--work-dir DIR] [--steps 300]

On the TPU dev machine prepend PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu to
run on the CPU backend (tiny-model training is host-bound either way); run
plain to exercise the real chip.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_full_loop(work_dir: str, steps: int = 300, copies: int = 8,
                  seconds: float = 25.0, python: str = sys.executable,
                  verbose: bool = True) -> dict:
    """Run the four stages; returns the vue_tr evaluate() dict."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    def sh(argv, tail=3):
        r = subprocess.run([python] + argv, cwd=REPO, env=env,
                           capture_output=True, text=True)
        if verbose or r.returncode != 0:
            lines = (r.stdout + r.stderr).strip().splitlines()
            print("\n".join(lines[-tail:]))
        assert r.returncode == 0, f"{argv[:3]} failed rc={r.returncode}"
        return r

    # 1. fixture: dummy.mp4 + example.json (the reference's smoke recipe)
    sh(["scripts/make_example.py", "--out-dir", work_dir,
        "--seconds", str(seconds), "--copies", str(copies)], tail=2)

    # 2. finetune a tiny Dattn until it memorizes the span answer, export HF
    hf_dir = os.path.join(work_dir, "hf_out")
    sh(["-m", "vidi_tpu.train.train", "--tiny",
        "--data_path", os.path.join(work_dir, "example.json"),
        "--video_folder", work_dir, "--max_steps", str(steps),
        "--learning_rate", "1e-3", "--mm_rand_lr", "1e-3",
        "--train_llm", "true",
        "--output_dir", os.path.join(work_dir, "ckpt"),
        "--export_hf", hf_dir], tail=2)

    # 3. reload the EXPORTED checkpoint and run the benchmark runner
    duration = json.load(open(os.path.join(work_dir, "example.json")))[0]["length"]
    gt = [{"query_id": "q0", "video_id": "dummy", "duration": duration,
           "query": "a moving gradient", "task": "temporal_retrieval",
           "gt": [[0.0, duration]],
           # evaluator breakdown fields (VUE-TRv2_ground_truth.json schema)
           "duration_category": "short", "query_format": "phrase",
           "query_modality": "vision"}]
    gt_path = os.path.join(work_dir, "gt.json")
    json.dump(gt, open(gt_path, "w"))
    pred_path = os.path.join(work_dir, "preds.json")
    sh(["-m", "vidi_tpu.infer.run_benchmark", "--task", "tr",
        "--gt", gt_path, "--video-dir", work_dir, "--out", pred_path,
        "--model-path", hf_dir, "--max-new-tokens", "24",
        "--dtype", "float32"], tail=2)

    # 4. score with the VUE-TR evaluator
    sys.path.insert(0, REPO)
    from vidi_tpu.evals.vue_tr import evaluate
    scores = evaluate(pred_path, gt_path, breakdown=False)
    if verbose:
        print(json.dumps(scores))
    return scores


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", default=None,
                    help="default: a fresh temp dir")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--copies", type=int, default=8)
    args = ap.parse_args()

    work = args.work_dir or tempfile.mkdtemp(prefix="vidi_full_loop_")
    os.makedirs(work, exist_ok=True)
    scores = run_full_loop(work, steps=args.steps, copies=args.copies)
    iou = scores["overall"]["iou"]
    ok = iou > 0.5
    print(f"full loop: IoU {iou:.4f} over {scores['n_query']} queries -> "
          f"{'OK' if ok else 'FAILED (model did not converge to the span)'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
