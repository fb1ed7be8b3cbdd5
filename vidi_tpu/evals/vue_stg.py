"""VUE-STG spatio-temporal grounding evaluation.

Behavior-identical rebuild of the reference scorer
(reference: VUE_STG/evaluate.py, VUE_STG/tube.py): tubes are
{quantized time_ms -> [sanitized bbox]} with 1-s round-half-up quantization;
per-frame region IoU uses a rectangle-union sweep-line; metric families are
temporal (frame-hit), 3D volume, and legacy mean-2D-IoU, with grouped
breakdowns over object size / video duration / GT duration.

The reference's self-check (single-box region math vs closed-form box IoU,
evaluate.py:229-237) is kept.

    python -m vidi_tpu.evals.vue_stg --dataset vue-stg-benchmark \
        --pred results/vidi2/tubes.csv
"""
from __future__ import annotations

import argparse
import os.path as osp
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

BBox = Tuple[float, float, float, float]
EPS = np.finfo(float).eps


def sanitize_bbox(b: BBox) -> BBox:
    x0, y0, x1, y1 = b
    if x0 > x1:
        x0, x1 = x1, x0
    if y0 > y1:
        y0, y1 = y1, y0
    clamp = lambda v: max(0.0, min(1.0, v))  # noqa: E731
    return (clamp(x0), clamp(y0), clamp(x1), clamp(y1))


def quantize_time_ms(t_ms: int, step_ms: int = 1000) -> int:
    """Round-half-up to the step grid (tube.py:22-25)."""
    if step_ms <= 0:
        raise ValueError("step_ms must be positive")
    return ((t_ms * 2 + step_ms) // (2 * step_ms)) * step_ms


class Tube:
    def __init__(self, step_ms: int = 1000):
        self.step_ms = step_ms
        self.slices: Dict[int, List[BBox]] = {}

    def add_bbox(self, t_ms: int, bbox: BBox):
        t = quantize_time_ms(int(t_ms), self.step_ms)
        self.slices.setdefault(t, []).append(sanitize_bbox(bbox))

    def avg_area(self) -> float:
        areas = [
            (x1 - x0) * (y1 - y0)
            for boxes in self.slices.values() for x0, y0, x1, y1 in boxes
        ]
        return sum(areas) / len(areas) if areas else 0.0

    def length(self) -> int:
        return sum(1 for v in self.slices.values() if v)

    @staticmethod
    def from_csv(path: str, step_ms: int = 1000) -> Dict[str, "Tube"]:
        df = pd.read_csv(path)
        req = ["query_id", "time_ms", "x0", "y0", "x1", "y1"]
        missing = [c for c in req if c not in df.columns]
        if missing:
            raise ValueError(f"CSV missing columns: {missing}")
        df = df.dropna(subset=req)
        tubes: Dict[str, Tube] = {}
        for row in df[req].itertuples(index=False):
            qid = row[0]
            tubes.setdefault(qid, Tube(step_ms)).add_bbox(
                int(row[1]), (float(row[2]), float(row[3]), float(row[4]), float(row[5])))
        return tubes


def union_area(rects: List[BBox]) -> float:
    """Union area of axis-aligned rectangles via x-strip sweep."""
    if not rects:
        return 0.0
    xs = sorted({x for r in rects for x in (r[0], r[2])})
    total = 0.0
    for x0, x1 in zip(xs, xs[1:]):
        dx = x1 - x0
        if dx <= 0:
            continue
        ys = sorted((r[1], r[3]) for r in rects if not (r[2] <= x0 or r[0] >= x1))
        if not ys:
            continue
        covered = 0.0
        cy0, cy1 = ys[0]
        for y0, y1 in ys[1:]:
            if y0 > cy1:
                covered += cy1 - cy0
                cy0, cy1 = y0, y1
            elif y1 > cy1:
                cy1 = y1
        covered += cy1 - cy0
        total += covered * dx
    return total


def region_inter_union(a: List[BBox], b: List[BBox]):
    area_a, area_b = union_area(a), union_area(b)
    if not a or not b:
        return 0.0, area_a + area_b, area_a, area_b
    inters = []
    for ax0, ay0, ax1, ay1 in a:
        for bx0, by0, bx1, by1 in b:
            ix0, iy0 = max(ax0, bx0), max(ay0, by0)
            ix1, iy1 = min(ax1, bx1), min(ay1, by1)
            if ix1 > ix0 and iy1 > iy0:
                inters.append((ix0, iy0, ix1, iy1))
    inter = union_area(inters)
    return inter, area_a + area_b - inter, area_a, area_b


def box_iou_parts(a: Optional[BBox], b: Optional[BBox]):
    """Closed-form single-box case, used as the internal cross-check."""
    area = lambda r: max(0.0, r[2] - r[0]) * max(0.0, r[3] - r[1]) if r else 0.0  # noqa: E731
    area_a, area_b = area(a), area(b)
    if a is None or b is None:
        return 0.0, area_a + area_b, area_a, area_b
    iw = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    ih = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = iw * ih
    return inter, area_a + area_b - inter, area_a, area_b


def compare_tubes(gt: Tube, pred: Tube, multi_boxes_policy: str = "first") -> Dict:
    ts = gt.slices.keys() | pred.slices.keys()
    assert ts, "Both tubes are empty; there is no frame to compare."
    inter_l, union_l, a_l, b_l = [], [], [], []
    for t in ts:
        sa = gt.slices.get(t, [])
        sb = pred.slices.get(t, [])
        if multi_boxes_policy == "first":
            sa, sb = sa[:1], sb[:1]
        elif multi_boxes_policy == "last":
            sa, sb = sa[-1:], sb[-1:]
        inter, union, area_a, area_b = region_inter_union(sa, sb)
        if len(sa) == 1 and len(sb) == 1:  # self-verifying metric
            ref = box_iou_parts(sa[0], sb[0])
            assert np.isclose(inter, ref[0]) and np.isclose(union, ref[1])
        inter_l.append(inter)
        union_l.append(union)
        a_l.append(area_a)
        b_l.append(area_b)

    inter = np.asarray(inter_l)
    union = np.asarray(union_l)
    aa = np.asarray(a_l)
    bb = np.asarray(b_l)
    n_a = int((aa > 0).sum())
    n_b = int((bb > 0).sum())
    n_i = int(np.logical_and(aa > 0, bb > 0).sum())
    n_u = int(np.logical_or(aa > 0, bb > 0).sum())
    iou2d = inter / (union + EPS)

    def safe(num, den):
        return None if den == 0 else num / den

    return {
        "t_iou": safe(n_i, n_u),
        "t_recall": safe(n_i, n_a),
        "t_precision": safe(n_i, n_b),
        "3d_iou": None if n_u == 0 else inter.sum() / (union.sum() + EPS),
        "3d_recall": None if n_a == 0 else inter.sum() / (aa.sum() + EPS),
        "3d_precision": None if n_b == 0 else inter.sum() / (bb.sum() + EPS),
        "v_iou": safe(iou2d.sum(), n_u),
        "v_recall": safe(iou2d.sum(), n_a),
        "v_precision": safe(iou2d.sum(), n_b),
        "v_iou_int": safe(iou2d.sum(), n_i),
    }


_COLS = {
    "t_iou": "t_IoU", "t_recall": "t_Recall", "t_precision": "t_Precision",
    "3d_iou": "3D_IoU", "3d_recall": "3D_Recall", "3d_precision": "3D_Precision",
    "v_iou": "v_IoU", "v_recall": "v_Recall", "v_precision": "v_Precision",
    "v_iou_int": "v_IoU_Int",
}


def add_groups(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["area_group"] = pd.cut(df["avg_area"], [-np.inf, 0.10, 0.30, np.inf],
                              labels=["<10%", "10%-30%", ">30%"], right=False)
    df["video_length_group"] = pd.cut(df["video_length"], [-np.inf, 60, 600, 1800],
                                      labels=["<1min", "1-10min", "10-30min"], right=False)
    df["gt_length_group"] = pd.cut(df["gt_length"], [-np.inf, 3, 10, 60],
                                   labels=["<3s", "3-10s", "10-60s"], right=False)
    return df


class SpatioTemporalEvaluator:
    def __init__(self, step_ms: int = 1000):
        self.step_ms = step_ms
        self.video_info: Dict = {}
        self.query_info: Dict = {}
        self.gt_tubes: Dict[str, Tube] = {}

    def load_dataset(self, root: str):
        vi = pd.read_csv(osp.join(root, "video.csv")).to_dict("records")
        self.video_info = {v["video_id"]: v for v in vi}
        qi = pd.read_csv(osp.join(root, "query.csv")).to_dict("records")
        self.query_info = {q["query_id"]: q for q in qi}
        self.gt_tubes = Tube.from_csv(osp.join(root, "tubes.csv"), self.step_ms)

    def evaluate_pred_file(self, path: str, grouped: bool = True,
                           ignore_missing_pred: bool = False) -> pd.DataFrame:
        preds = Tube.from_csv(path, self.step_ms)
        rows = []
        for qid, gt in self.gt_tubes.items():
            if qid in preds:
                pred = preds[qid]
            elif ignore_missing_pred:
                continue
            else:
                pred = Tube(self.step_ms)
            vid = self.query_info[qid]["video_id"]
            row = {
                "query_id": qid,
                "avg_area": gt.avg_area(),
                "video_length": self.video_info[vid]["video_duration"],
                "gt_length": gt.length(),
            }
            row.update(compare_tubes(gt, pred))
            rows.append(row)
        df = pd.DataFrame(rows).rename(columns=_COLS)
        return add_groups(df) if grouped else df


def summarize(df: pd.DataFrame) -> pd.DataFrame:
    if "area_group" not in df.columns:
        df = add_groups(df)
    overall = df.mean(numeric_only=True).to_frame().T
    overall["category"], overall["group"] = "overall", "overall"

    def gmean(col, group):
        g = df.groupby(col, dropna=False, observed=True).mean(numeric_only=True).reset_index()
        g = g.rename(columns={col: "category"})
        g["group"] = group
        return g

    df_all = pd.concat([
        overall, gmean("area_group", "object size"),
        gmean("video_length_group", "video duration"),
        gmean("gt_length_group", "gt duration")], ignore_index=True)
    metrics = ["t_Precision", "t_Recall", "t_IoU",
               "v_Precision", "v_Recall", "v_IoU", "v_IoU_Int"]
    return df_all[["group", "category"] + [m for m in metrics if m in df_all.columns]]


def main():
    ap = argparse.ArgumentParser(description="VUE-STG evaluation")
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--pred", required=True, nargs="+",
                    help="one or more tubes.csv files (the reference's "
                         "__main__ loops over several models' results)")
    ap.add_argument("--out_csv", default=None,
                    help="summary csv; with multiple --pred files, a "
                         "suffix per prediction file's parent dir")
    ap.add_argument("--ignore-missing-pred", action="store_true",
                    help="skip GT queries absent from predictions instead "
                         "of scoring them as empty tubes "
                         "(evaluate.py ignore_missing_pred)")
    args = ap.parse_args()
    ev = SpatioTemporalEvaluator(step_ms=1000)
    ev.load_dataset(args.dataset)
    for pred in args.pred:
        if len(args.pred) > 1:
            print("=" * 64)
            print(f"Predictions: {pred}")
        df = ev.evaluate_pred_file(
            pred, ignore_missing_pred=args.ignore_missing_pred)
        summary = summarize(df)
        print(summary.round(4))
        if args.out_csv:
            out = args.out_csv
            if len(args.pred) > 1:
                import os as _os
                tag = _os.path.basename(_os.path.dirname(pred)) or \
                    _os.path.splitext(_os.path.basename(pred))[0]
                root, ext = _os.path.splitext(args.out_csv)
                out = f"{root}_{tag}{ext}"
            summary.to_csv(out, index=False)
            print(f"Saved: {out}")


if __name__ == "__main__":
    main()
