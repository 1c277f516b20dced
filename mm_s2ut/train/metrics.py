"""Metric aggregation + TensorBoard/CSV sinks.

TPU-native replacement for fairseq.logging.metrics + --tensorboard-logdir
(SURVEY.md F17; reference criterions/speech_to_speech_criterion.py:104-123,
scripts/textless/1_train.sh:107). Device metrics arrive as summed pytrees
from the jitted step (cross-replica reduction already folded in by XLA);
this module normalizes, smooths, and writes them.
"""
from __future__ import annotations

import csv
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional


class MetricsAggregator:
    """Running sums between log flushes (fairseq log_scalar analog)."""

    def __init__(self):
        self.sums: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._t0: Optional[float] = None  # first update() in the window

    def update(self, metrics: Dict[str, float]) -> None:
        # Rate windows start at the first update after a flush, so
        # *_per_sec excludes compile/eval/checkpoint gaps between windows
        # (a flush-to-flush clock silently deflates the rate after any
        # pause — the metric would promise throughput it didn't measure).
        if self._t0 is None:
            self._t0 = time.time()
        for k, v in metrics.items():
            self.sums[k] += float(v)
            self.counts[k] += 1

    def flush(self, normalize_by: Optional[str] = "ntokens") -> Dict[str, float]:
        """Normalized snapshot + reset. Loss-like keys divide by the
        normalizer sum; rate keys divide by elapsed wall time."""
        out: Dict[str, float] = {}
        denom = max(self.sums.get(normalize_by, 0.0), 1.0) if normalize_by else 1.0
        elapsed = max(time.time() - (self._t0 or time.time()), 1e-9)
        for k, v in self.sums.items():
            if k in ("ntokens", "nsentences"):
                out[k] = v
                out[f"{k}_per_sec"] = v / elapsed
            elif k == "grad_norm":
                out[k] = v / max(self.counts[k], 1)
            else:
                out[k] = v / denom
        self.sums.clear()
        self.counts.clear()
        self._t0 = None
        return out


class MetricsWriter:
    """CSV always; TensorBoard when TF is importable."""

    def __init__(self, logdir: str | Path, enable_tensorboard: bool = True):
        self.logdir = Path(logdir)
        self.logdir.mkdir(parents=True, exist_ok=True)
        self._csv_path = self.logdir / "metrics.csv"
        self._csv_fields = None
        self._tb = None
        if enable_tensorboard:
            try:
                import tensorflow as tf  # noqa: F811

                self._tb = tf.summary.create_file_writer(str(self.logdir))
            except Exception:
                self._tb = None

    def write(self, step: int, metrics: Dict[str, float], prefix: str = "train") -> None:
        row = {"step": step, **{f"{prefix}/{k}": v for k, v in metrics.items()}}
        if self._csv_fields is None and self._csv_path.exists():
            # Resumed run: adopt the existing header so appended rows align.
            with open(self._csv_path, newline="") as f:
                first = f.readline().strip()
            self._csv_fields = first.split(",") if first else None
        if self._csv_fields is None:
            self._csv_fields = list(row)
            with open(self._csv_path, "a", newline="") as f:
                csv.DictWriter(f, fieldnames=self._csv_fields).writeheader()
        new_fields = [k for k in row if k not in self._csv_fields]
        if new_fields:
            # First row of a new prefix (e.g. valid/*): extend the header
            # in place, padding existing rows — freezing the first write's
            # fields would silently drop every later metric family.
            self._csv_fields += new_fields
            with open(self._csv_path, newline="") as f:
                rows = list(csv.DictReader(f))
            with open(self._csv_path, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self._csv_fields)
                w.writeheader()
                w.writerows(rows)
        with open(self._csv_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._csv_fields)
            w.writerow(row)
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(f"{prefix}/{k}", v, step=step)
                self._tb.flush()
