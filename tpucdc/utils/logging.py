"""Metric logging: JSONL always, clu/TensorBoard when available
(SURVEY.md C24, §5.5 — every eval emits rows BASELINE.md can be regenerated
from)."""

from __future__ import annotations

import functools
import json
import pathlib
import subprocess
import sys
import time
from typing import Any, Optional


@functools.lru_cache(maxsize=1)
def code_sha() -> str:
    """Repo git SHA, resolved ONCE at first use (VERDICT r3 item 10).

    Every eval row carries the SHA of the code that produced it, so
    make_baseline_tables can refuse to mix rows from different code states —
    the r3 λ=128 record was contaminated by a long-lived child process
    evaluating with pre-metric-fix in-memory code, which this catches.
    Long-lived processes deliberately keep the SHA they started with."""
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=pathlib.Path(__file__).resolve().parents[2],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


class MetricLogger:
    """step-keyed metric writer: JSONL file + optional clu summary writer +
    stderr echo. Callable as ``writer(step, metrics_dict)`` (the signature
    pipelines.train.fit expects)."""

    def __init__(self, logdir: str | pathlib.Path,
                 use_clu: bool = True, echo: bool = True):
        self.logdir = pathlib.Path(logdir)
        self.logdir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.logdir / "metrics.jsonl", "a", buffering=1)
        self._echo = echo
        self._clu = None
        if use_clu:
            try:
                from clu import metric_writers
                self._clu = metric_writers.SummaryWriter(str(self.logdir))
            except Exception:
                self._clu = None

    def __call__(self, step: int, metrics: dict[str, Any]) -> None:
        row = {"step": step, "time": time.time(), "code_sha": code_sha()}
        row.update({k: float(v) for k, v in metrics.items()
                    if isinstance(v, (int, float))})
        self._jsonl.write(json.dumps(row) + "\n")
        skip = ("step", "time", "code_sha")
        if self._clu is not None:
            self._clu.write_scalars(
                step, {k: v for k, v in row.items() if k not in skip})
        if self._echo:
            parts = " ".join(f"{k}={v:.4g}" for k, v in row.items()
                             if k not in skip)
            print(f"[step {step}] {parts}", file=sys.stderr)

    def write_row(self, row: dict) -> None:
        """Free-form JSONL row (eval results). Stamped with the producing
        code's git SHA unless the caller already set one."""
        row = {**row} if "code_sha" in row else {**row,
                                                "code_sha": code_sha()}
        self._jsonl.write(json.dumps(row, default=float) + "\n")

    def close(self):
        self._jsonl.close()
        if self._clu is not None:
            self._clu.close()
