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
