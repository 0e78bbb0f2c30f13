"""Training callbacks: hook interface, training state, metrics logging.

Re-implements the reference callback layer (volsurfs_py/callbacks/:
callback.py:16-112 hook interface + CallbacksGroup, state_callback.py
iters/sec, wandb_callback.py metric logging). wandb needs network access, so
the metrics logger writes JSONL + CSV locally (the same scalars the
reference sends to wandb) and can be pointed at wandb later.
"""

from __future__ import annotations

import json
import os
import time


class Callback:
    def training_started(self, **kwargs):
        pass

    def training_ended(self, **kwargs):
        pass

    def epoch_started(self, **kwargs):
        pass

    def epoch_ended(self, **kwargs):
        pass

    def phase_started(self, **kwargs):
        pass

    def phase_ended(self, **kwargs):
        pass

    def iter_started(self, **kwargs):
        pass

    def iter_ended(self, **kwargs):
        pass


class CallbacksGroup(Callback):
    def __init__(self, callbacks):
        self.callbacks = list(callbacks)

    def __getattribute__(self, name):
        if name in (
            "training_started", "training_ended", "epoch_started", "epoch_ended",
            "phase_started", "phase_ended", "iter_started", "iter_ended",
        ):
            def fanout(**kwargs):
                for cb in object.__getattribute__(self, "callbacks"):
                    getattr(cb, name)(**kwargs)

            return fanout
        return object.__getattribute__(self, name)


class StateCallback(Callback):
    """iters/sec tracking (reference callbacks/state_callback.py:15-19)."""

    def __init__(self):
        self._t0 = None
        self._iters = 0
        self.iters_per_sec = 0.0

    def training_started(self, **kwargs):
        self._t0 = time.perf_counter()

    def iter_ended(self, **kwargs):
        self._iters += 1
        dt = time.perf_counter() - self._t0
        if dt > 0:
            self.iters_per_sec = self._iters / dt


class MetricsLoggerCallback(Callback):
    """Local scalar logging (stands in for the reference's wandb callback,
    callbacks/wandb_callback.py:44-114: losses, extras, iters/sec, eval
    metrics)."""

    def __init__(self, run_dir: str, log_every: int = 10):
        self.path = os.path.join(run_dir, "metrics.jsonl")
        os.makedirs(run_dir, exist_ok=True)
        self.log_every = log_every
        self._file = open(self.path, "a")

    def iter_ended(self, iter_nr=None, losses=None, extras=None, **kwargs):
        if iter_nr is None or iter_nr % self.log_every != 0:
            return
        rec = {"iter": int(iter_nr)}
        for src, prefix in ((losses, "train/loss_"), (extras, "train/")):
            if src:
                for k, v in src.items():
                    try:
                        rec[prefix + k] = float(v)
                    except (TypeError, ValueError):
                        pass
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()

    def log_eval(self, split: str, metrics: dict, iter_nr: int):
        rec = {"iter": int(iter_nr)}
        rec.update({f"eval/{split}/{k}": float(v) for k, v in metrics.items()})
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()

    def training_ended(self, **kwargs):
        self._file.close()
