"""Rank-aware logging + CSV metric sink.

Behavioral reference: fast3r/utils/pylogger.py:13-57 (RankedLogger — rank-
prefixed messages, rank-zero-only filtering) and the csv/wandb logger group
(configs/logger/*).  The process index comes from jax.process_index() instead
of torch.distributed; wandb/tensorboard sinks attach only if importable.
"""

from __future__ import annotations

import csv
import logging
import os
from typing import Any, Dict, Optional

logging.basicConfig(
    level=os.environ.get("FAST3R_TPU_LOGLEVEL", "INFO"),
    format="%(asctime)s %(levelname)s %(name)s: %(message)s",
)


def _rank() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


class RankedLogger(logging.LoggerAdapter):
    """Prefixes messages with the process rank; optionally rank-zero only."""

    def __init__(self, name: str = __name__, rank_zero_only: bool = True):
        super().__init__(logging.getLogger(name), {})
        self.rank_zero_only = rank_zero_only

    def log(self, level, msg, *args, **kwargs):
        if self.isEnabledFor(level):
            rank = _rank()
            if self.rank_zero_only and rank != 0:
                return
            msg = f"[rank {rank}] {msg}"
            self.logger.log(level, msg, *args, **kwargs)


class MetricLogger:
    """Appends metric dicts to a CSV (union-of-keys header managed lazily);
    mirrors to wandb when available and configured."""

    def __init__(self, csv_path: str, use_wandb: bool = False,
                 wandb_kwargs: Optional[Dict] = None):
        self.csv_path = csv_path
        os.makedirs(os.path.dirname(csv_path) or ".", exist_ok=True)
        self._fieldnames = None
        if os.path.exists(csv_path):
            # resume: adopt the existing header so prior rows are preserved
            with open(csv_path, newline="") as f:
                header = next(csv.reader(f), None)
            if header:
                self._fieldnames = list(header)
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(**(wandb_kwargs or {"project": "fast3r_tpu"}))
            except ImportError:
                pass

    def log(self, **metrics: Any) -> None:
        if _rank() != 0:
            return
        if self._fieldnames is None or any(
            k not in self._fieldnames for k in metrics
        ):
            self._rewrite_with_fields(metrics)
        with open(self.csv_path, "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._fieldnames)
            writer.writerow(metrics)
        if self._wandb is not None:
            self._wandb.log(metrics)

    def _rewrite_with_fields(self, metrics: Dict) -> None:
        old_rows = []
        if os.path.exists(self.csv_path):
            with open(self.csv_path) as f:
                old_rows = list(csv.DictReader(f))
        fields = list(self._fieldnames or [])
        for k in metrics:
            if k not in fields:
                fields.append(k)
        self._fieldnames = fields
        with open(self.csv_path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=fields)
            writer.writeheader()
            for row in old_rows:
                writer.writerow(row)
