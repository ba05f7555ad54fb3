"""Shared training-loop utilities: LR plateau control, metric logging,
throughput tracking.

Parity targets: ReduceLROnPlateau(factor=.5, patience=50, min_lr=1e-4)
(attacker_train.py:70-72), TensorBoard steps/sec logging
(attacker_train.py:39-41) and best-checkpoint selection by monitored metric
(attacker_train.py:49-56). Visualization (ASR curves / violin plots) runs
host-side on fetched metrics — the reference's matplotlib-in-graph tfplot
hack (attacker.py:221-236) has no place in a jitted program.
"""
from __future__ import annotations

import json
import math
import os
import time
from typing import Any, Dict, Optional


class ReduceLROnPlateau:
    """Host-side plateau LR controller mutating an optax
    inject_hyperparams state."""

    def __init__(self, factor: float = 0.5, patience: int = 50,
                 min_lr: float = 1e-4, mode: str = "min"):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.mode = mode
        self.best = float("inf") if mode == "min" else -float("inf")
        self.wait = 0

    def update(self, metric: float, opt_state) -> Any:
        """Returns the (possibly modified) opt_state."""
        improved = (metric < self.best) if self.mode == "min" else (
            metric > self.best)
        if improved:
            self.best = metric
            self.wait = 0
            return opt_state
        self.wait += 1
        if self.wait >= self.patience:
            self.wait = 0
            lr = float(opt_state.hyperparams["learning_rate"])
            new_lr = max(lr * self.factor, self.min_lr)
            opt_state.hyperparams["learning_rate"] = (
                opt_state.hyperparams["learning_rate"] * 0 + new_lr)
        return opt_state


def save_loop_state(path: str, state: Any, *, epoch: int, step: int,
                    best: float, plateau: "ReduceLROnPlateau",
                    aug_key) -> None:
    """Full-state training checkpoint for kill-and-resume.

    Persists the device state pytree (params/patch + OPTIMIZER moments +
    step + PRNG chain) together with every host-side loop variable the
    trajectory depends on: epoch/step counters, best-metric gate, the
    plateau controller's best/wait counters (its current LR already lives
    in the optax inject_hyperparams state inside `state`), and the
    augmentation key. The reference's own resume is patch+scale only and
    silently resets Adam moments (attacker.py:328-341); this one resumes
    the exact uninterrupted trajectory (tested step-for-step)."""
    import numpy as np

    from ..ckpt import io as ckpt_io
    payload = {"state": state, "aug_key": aug_key,
               "loop": np.asarray([epoch, step], np.int64),
               "best": np.asarray(best, np.float64),
               "plateau": np.asarray([plateau.best, plateau.wait],
                                     np.float64)}
    ckpt_io.save_state_bytes(path, payload)


def load_loop_state(path: str, state_template: Any, aug_key_template,
                    plateau: "ReduceLROnPlateau"):
    """Restore a save_loop_state checkpoint.

    Mutates `plateau` in place; returns
    (state, aug_key, start_epoch, step, best)."""
    import jax.numpy as jnp
    import numpy as np

    from ..ckpt import io as ckpt_io
    payload = {"state": state_template, "aug_key": aug_key_template,
               "loop": np.zeros(2, np.int64),
               "best": np.zeros((), np.float64),
               "plateau": np.zeros(2, np.float64)}
    p = ckpt_io.load_state_bytes(path, payload)
    plateau.best = float(p["plateau"][0])
    plateau.wait = int(p["plateau"][1])
    return (p["state"], jnp.asarray(p["aug_key"]), int(p["loop"][0]),
            int(p["loop"][1]), float(p["best"]))


class MetricLogger:
    """JSONL metric log + optional TensorBoard (if tensorflow available)."""

    def __init__(self, log_dir: str, use_tensorboard: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        # multi-host: each process writes its own file (process 0 keeps
        # the canonical name) so N hosts sharing a log dir never
        # interleave lines in one JSONL
        import jax
        suffix = ("" if jax.process_index() == 0
                  else f".p{jax.process_index()}")
        self.path = os.path.join(log_dir, f"metrics{suffix}.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf
                self._tb = tf.summary.create_file_writer(log_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, float], prefix: str = ""):
        # Non-finite values (e.g. asr_to_scale on steps where ASR isn't
        # evaluated — attack/attacker.py with_asr=False) are recorded as
        # JSON null: the line stays strict JSON (json.dumps would emit
        # the invalid token `NaN`) and numeric consumers averaging a
        # column skip them without NaN-poisoning the aggregate.
        rec = {"step": step, "time": time.time()}
        rec.update({(prefix + k): (float(v) if math.isfinite(float(v))
                                   else None)
                    for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in metrics.items():
                    if math.isfinite(float(v)):
                        tf.summary.scalar(prefix + k, float(v), step=step)

    def close(self):
        self._f.close()


class Throughput:
    """Images/sec tracker (steps-per-second metric equivalent)."""

    def __init__(self):
        self.t0 = None
        self.images = 0

    def start(self):
        self.t0 = time.time()
        self.images = 0

    def count(self, n: int):
        self.images += n

    def rate(self) -> float:
        dt = time.time() - self.t0
        return self.images / dt if dt > 0 else 0.0
