"""VUE task prompts + answer decoding.

The reference ships only the temporal-retrieval driver
(reference: Vidi1.5_9B/vidi/eval/inference.py:34, Vidi_7B/inference.py:34) but
the model family covers temporal retrieval, spatio-temporal grounding,
chaptering, highlights, and video QA (reference: README.md:1-24, VUE_PLOT
MCQ predictions). This module collects the task surface in one place:
prompt builders + output parsers per task, keyed by `mm_version` where the
generations differ.

Output contracts (SURVEY.md §2.7):
- TR: normalized `a.aaa-b.bbb` ranges in text -> seconds via duration.
- STG: `t0-t1: x0,y0,x1,y1; ...` segments -> tubes.csv rows
  (infer/run_benchmark.parse_stg_tubes).
- VQA: MCQ letter, optionally wrapped in <answer></answer>
  (evals/vue_plot.extract_answer).
- Chaptering / highlights: time ranges + titles, parsed with the TR regex
  per line.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from vidi_tpu.infer.pipeline import (
    TIME_RANGE_RE,
    TIME_RANGE_RE_V1,
    TR_PROMPT,
    TR_PROMPT_V1,
    parse_time_ranges,
)

STG_PROMPT = ("During which time segments in the video can we see {}? For "
              "each segment, give the bounding box of the target as "
              "t0-t1: x0,y0,x1,y1.")
CHAPTER_PROMPT = ("Divide the video into chapters. For each chapter, answer "
                  "the time range as normalized values followed by a short "
                  "title, one per line.")
HIGHLIGHT_PROMPT = ("Which time segments of the video are the highlights"
                    "{}? Answer the time ranges as normalized values.")
QA_PROMPT = "{}"
MCQ_PROMPT = ("{question}\nOptions:\n{options}\nAnswer with the letter of "
              "the correct option.")
# Character grounding (VUE-PLOT): transcript segments with per-timestamp
# boxes. The reference ships no decoder for this either (Vidi2.5 weights
# unreleased) — the text convention and its parser are defined together,
# like STG. Times are duration-normalized; boxes 0-1 (or 0-1000, divided
# down by the parser like character_eval.py:293-295).
CHARACTER_PROMPT = (
    'Transcribe what {} says in the video. For each utterance, answer the '
    'normalized time range, the transcript in quotes, and the bounding box '
    'of the speaker at each timestamp, like '
    '0.123-0.145: "the transcript" [0.130: 0.21,0.30,0.45,0.92; '
    '0.140: 0.22,0.31,0.46,0.93], one utterance per line.')

CHARACTER_SEG_RE = re.compile(
    r'(\d\.\d+)-(\d\.\d+)\s*:\s*"([^"]*)"\s*\[([^\]]*)\]')
CHARACTER_BOX_RE = re.compile(
    r"(\d\.\d+)\s*:\s*([\d.]+)\s*,\s*([\d.]+)\s*,\s*([\d.]+)\s*,\s*([\d.]+)")


def parse_character(text: str, duration: float) -> List[Dict]:
    """Model character-grounding text -> [{"start", "end", "text", "boxes":
    [{"timestamp", "box_2d"}]}] with times in SECONDS — the segment schema
    of the character_eval input (VUE_PLOT/character_eval.py:286-300)."""
    segs = []
    for m in CHARACTER_SEG_RE.finditer(text):
        boxes = []
        for bm in CHARACTER_BOX_RE.finditer(m.group(4)):
            box = [float(bm.group(i)) for i in range(2, 6)]
            if any(c > 1.0 for c in box):
                box = [c / 1000.0 for c in box]
            boxes.append({"timestamp": float(bm.group(1)) * duration,
                          "box_2d": box})
        segs.append({"start": float(m.group(1)) * duration,
                     "end": float(m.group(2)) * duration,
                     "text": m.group(3).strip(),
                     "boxes": boxes})
    return segs


def build_task_prompt(task: str, query: str = "", *, mm_version: str = "v1.5",
                      length: float = 0.0,
                      options: Optional[List[str]] = None) -> str:
    """-> the user-turn text (before chat templating / <image> splicing)."""
    q = query[:-1] if query.endswith(".") else query
    if task == "tr":
        if mm_version == "v1":
            return TR_PROMPT_V1.format(length, q)
        return TR_PROMPT.format(q)
    if task == "stg":
        return STG_PROMPT.format(q)
    if task == "chapter":
        return CHAPTER_PROMPT
    if task == "highlight":
        return HIGHLIGHT_PROMPT.format(f" related to {q}" if q else "")
    if task == "qa":
        return QA_PROMPT.format(query)
    if task == "mcq":
        opts = "\n".join(f"{chr(65 + i)}. {o}" for i, o in enumerate(options or []))
        return MCQ_PROMPT.format(question=query, options=opts)
    if task == "character":
        return CHARACTER_PROMPT.format(q)
    raise ValueError(f"unknown task: {task}")


def parse_chapters(text: str, length: float,
                   mm_version: str = "v1.5") -> List[Dict]:
    """Chaptering output -> [{"start", "end", "title"}] in seconds."""
    pattern = TIME_RANGE_RE_V1 if mm_version == "v1" else TIME_RANGE_RE
    out = []
    for line in text.splitlines():
        m = pattern.search(line)
        if not m:
            continue
        try:
            t0, t1 = float(m.group(1)), float(m.group(2))
        except ValueError:
            continue
        title = line[m.end():].strip(" :–-\t")
        out.append({"start": t0 * length, "end": t1 * length, "title": title})
    return out


def parse_highlights(text: str, length: float,
                     mm_version: str = "v1.5") -> List[Tuple[float, float]]:
    return [(a * length, b * length)
            for a, b in parse_time_ranges(text, mm_version)]


def parse_mcq(text: str) -> str:
    """MCQ letter, <answer>-wrapped or bare (vue_plot.extract_answer rules)."""
    from vidi_tpu.evals.vue_plot import extract_answer
    return extract_answer(text)
