"""Observability: run logger, structured metric writer, and the reference's CSV contracts.

Capability parity: EVOKE's SetLogger (modules/utils.py:24-50, append-only file log,
print+log duplication), the best-record CSV (trainer_v0401.py:126-144), and the
per-epoch prediction CSVs (val/test_prediction.csv with metric rows FIRST and
per-epoch columns merged on images_id, trainer_v0401.py:504-569,643-656 — this is
how the published numbers are stored). Adds what the reference lacks (SURVEY §5.1):
a structured jsonl metric stream with per-step timing.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional, Sequence

import pandas as pd


class RunLogger:
    """Append-only file log + stdout duplication."""

    def __init__(self, path: str, echo: bool = True):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self.echo = echo

    def info(self, msg: str) -> None:
        stamp = time.strftime("%Y-%m-%d %H:%M:%S")
        line = f"{stamp} | {msg}"
        with open(self.path, "a") as f:
            f.write(line + "\n")
        if self.echo:
            print(line, flush=True)


class MetricWriter:
    """jsonl metric stream: one record per event with wall time."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path

    def write(self, record: Dict[str, Any]) -> None:
        record = {"ts": time.time(), **record}
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=float) + "\n")


def append_best_record(csv_path: str, record: Dict[str, Any]) -> None:
    """Best-record CSV: one row per run with best val/test metrics."""
    df = pd.DataFrame([record])
    header = not os.path.exists(csv_path)
    df.to_csv(csv_path, mode="a", header=header, index=False)


class PredictionCSV:
    """val/test_prediction.csv: metric rows first, then one row per image id;
    each epoch adds a column, merged on images_id (the reference's contract)."""

    def __init__(self, path: str):
        self.path = path

    def update(self, epoch_label: str, image_ids: Sequence[str], ground_truth: Sequence[str],
               predictions: Sequence[str], metrics: Dict[str, float]) -> None:
        col = f"pred_{epoch_label}"
        rows: List[Dict[str, Any]] = []
        for name, value in metrics.items():
            rows.append({"images_id": f"__metric__{name}", "ground_truth": name, col: value})
        for iid, gt, pred in zip(image_ids, ground_truth, predictions):
            rows.append({"images_id": iid, "ground_truth": gt, col: pred})
        new = pd.DataFrame(rows)
        if os.path.exists(self.path):
            old = pd.read_csv(self.path, dtype=str)
            if col in old.columns:
                old = old.drop(columns=[col])
            merged = old.merge(new.astype({c: str for c in new.columns}),
                               on="images_id", how="outer", suffixes=("", "_new"))
            if "ground_truth_new" in merged.columns:
                merged["ground_truth"] = merged["ground_truth"].fillna(
                    merged["ground_truth_new"])
                merged = merged.drop(columns=["ground_truth_new"])
            merged.to_csv(self.path, index=False)
        else:
            new.to_csv(self.path, index=False)

    @staticmethod
    def read_metrics(path: str) -> Dict[str, Dict[str, float]]:
        """Read back the metric rows: {metric_name: {column: value}}."""
        df = pd.read_csv(path, dtype=str)
        out: Dict[str, Dict[str, float]] = {}
        for _, row in df.iterrows():
            iid = str(row["images_id"])
            if iid.startswith("__metric__"):
                name = iid[len("__metric__"):]
                out[name] = {c: float(row[c]) for c in df.columns
                             if c.startswith("pred_") and pd.notna(row[c])}
        return out
