"""Structured metric logging + the reference's artifact outputs.

The reference logs via print + matplotlib curve PNGs + image grids
(SURVEY.md §5.5).  MetricLogger writes JSONL (machine-readable), mirrors
to stdout, and can render the same loss/mIoU curve PNGs when matplotlib
is present.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict


class MetricLogger:
    def __init__(self, log_dir: str | None = None, plot_every: int = 0):
        self.log_dir = log_dir
        self.plot_every = plot_every
        self.history: dict[str, list[tuple[int, float]]] = defaultdict(list)
        self._file = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._t0 = time.time()

    def log(self, step: int, metrics: dict, prefix: str = ""):
        rec = {"step": int(step), "time": round(time.time() - self._t0, 2)}
        for k, v in metrics.items():
            key = f"{prefix}{k}"
            val = float(v)
            rec[key] = val
            self.history[key].append((int(step), val))
        if self._file:
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
        if self.plot_every and step % self.plot_every == 0:
            self.plot()
        return rec

    def print(self, step: int, metrics: dict, every: int = 50):
        if step % every == 0:
            parts = " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items())
            print(f"step {step}: {parts}", flush=True)

    def plot(self):
        if not self.log_dir:
            return
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        for key, series in self.history.items():
            if len(series) < 2:
                continue
            xs, ys = zip(*series)
            plt.figure(figsize=(6, 4))
            plt.plot(xs, ys, label=key)
            plt.grid(True)
            plt.legend()
            plt.title(key)
            plt.savefig(os.path.join(self.log_dir, f"{key.replace('/', '_')}.png"))
            plt.close()

    def close(self):
        if self._file:
            self._file.close()
