"""Factual serialization: report -> ordered clinical keyword sentences.

Capability parity: EVOKE modules/factual_serialization.py — run RadGraph NER
over reports and turn entity graphs into ordered ``core_findings`` keyword
lists; also extract the indication-section serialization. The RadGraph
AllenNLP/DyGIE stack is a host-side dependency (SURVEY §2.12) exposed through
evals/radgraph.py when installed; this module provides the orchestration plus a
dependency-free heuristic extractor so the pipeline runs end-to-end without it
(sentence-wise stopword-filtered noun-ish phrases — clearly marked lower
fidelity than RadGraph).
"""

from __future__ import annotations

import json
import re
from typing import Callable, Dict, List, Optional

from evoke_tpu.tools.section_parser import extract_section

_STOPWORDS = set("""a an and are as at be been by for from has have in is it its of on
or that the there this to was were with within without seen noted nota note
compared comparison prior stable unchanged again redemonstrated demonstrates
demonstrated evidence visualized otherwise grossly status please clinical
correlation recommend recommended""".split())

_NEGATION = ("no ", "without ", "free of ", "negative for ")

_SENT_SPLIT = re.compile(r"(?<=[.?!])\s+")


def heuristic_core_findings(report: str, max_keywords_per_sentence: int = 6
                            ) -> List[str]:
    """Dependency-free factual serialization: per sentence, keep negation cues +
    content words (stopword-filtered), joined in report order."""
    out: List[str] = []
    for sent in _SENT_SPLIT.split(report.strip()):
        s = sent.strip().lower().rstrip(".")
        if not s:
            continue
        neg = any(s.startswith(n) or f" {n}" in f" {s} " for n in _NEGATION)
        words = re.findall(r"[a-z][a-z\-]+", s)
        content = [w for w in words if w not in _STOPWORDS][:max_keywords_per_sentence]
        if not content:
            continue
        phrase = " ".join(content)
        out.append(f"no {phrase}" if neg and not phrase.startswith("no ") else phrase)
    return out


def serialize_annotation(ann: Dict[str, List[dict]],
                         ner_fn: Optional[Callable[[List[str]], List[List[str]]]] = None,
                         batch_size: int = 64) -> Dict[str, List[dict]]:
    """Fill core_findings + indication_core_findings for every item.

    ner_fn: texts -> list of keyword lists (e.g. evals.radgraph.radgraph_serialize);
    falls back to the heuristic extractor.
    """
    for split, items in ann.items():
        reports = [it.get("report", "") for it in items]
        if ner_fn is not None:
            all_kws: List[List[str]] = []
            for start in range(0, len(reports), batch_size):
                all_kws.extend(ner_fn(reports[start:start + batch_size]))
        else:
            all_kws = [heuristic_core_findings(r) for r in reports]
        for item, kws in zip(items, all_kws):
            item["core_findings"] = kws
            ind = extract_section(item.get("raw_report", item.get("report", "")),
                                  "indication")
            if ind and not item.get("indication_core_findings"):
                ind_kws = (ner_fn([ind])[0] if ner_fn is not None
                           else heuristic_core_findings(ind))
                item["indication_core_findings"] = " ".join(ind_kws)
    return ann


def serialize_file(ann_path: str, out_path: str, use_radgraph: bool = True) -> str:
    ner_fn = None
    if use_radgraph:
        try:
            from evoke_tpu.evals.radgraph import radgraph_serialize
            ner_fn = radgraph_serialize
        except Exception:
            ner_fn = None
    with open(ann_path) as f:
        ann = json.load(f)
    ann = serialize_annotation(ann, ner_fn=ner_fn)
    with open(out_path, "w") as f:
        json.dump(ann, f)
    return out_path
