"""Model-optimization: magnitude pruning (reference tf2/tfmot.py analog).

The reference exposes tensorflow_model_optimization wrappers — a method
registry {'prune': prune_low_magnitude, 'quantize': ...}
(tf2/tfmot.py:31-49). The TPU-native equivalent operates on flax param
pytrees directly:

- `prune_low_magnitude(params, sparsity)` — one-shot magnitude pruning of
  conv/dense kernels (smallest |w| zeroed per layer).
- `MagnitudePruner` + `PolynomialDecaySchedule` — prune-during-training
  with tfmot's PolynomialDecay sparsity ramp
  (tfmot.sparsity.keras.PolynomialDecay semantics). The mask update is
  pure jnp, so it composes into a jitted train step.
- `get_method(name)` — the tfmot.py method registry: 'prune' here,
  'quantize' dispatching to inference.quantize (the int8 PTQ path).

Like tfmot, only weight *kernels* are pruned — biases, BN affines and
statistics are left dense (pruning them harms accuracy with no sparsity
win at these sizes).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _is_kernel(path: Tuple, leaf) -> bool:
    """Prunable = a >=2-D 'kernel' leaf (conv/dense/transpose weights)."""
    name = str(getattr(path[-1], "key", path[-1])) if path else ""
    return name == "kernel" and getattr(leaf, "ndim", 0) >= 2


def _path_str(path: Tuple) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def _layer_mask(w, sparsity):
    """Keep-mask zeroing the `sparsity` fraction of smallest |w|.

    Threshold by sorted rank (tfmot prunes per-layer by magnitude rank,
    pruning_impl.py semantics): with k = round(sparsity*n) weights pruned,
    the keep threshold is the (k+1)-th smallest magnitude.
    """
    flat = jnp.abs(w).reshape(-1)
    n = flat.shape[0]
    k = jnp.clip(jnp.round(sparsity * n).astype(jnp.int32), 0, n - 1)
    # keep everything >= the (k+1)-th smallest magnitude: exactly k pruned
    # when magnitudes are distinct; ties at the threshold are all kept
    return jnp.abs(w) >= jnp.sort(flat)[k]


def prune_low_magnitude(params, sparsity: float, *,
                        scope: Optional[Callable[[str], bool]] = None):
    """One-shot magnitude pruning. Returns (pruned_params, report).

    scope: optional predicate over the 'a/b/kernel' path string — layers
    where it returns False are left dense.
    """
    report: Dict[str, float] = {}

    def prune(path, leaf):
        p = _path_str(path)
        if not _is_kernel(path, leaf) or (scope and not scope(p)):
            return leaf
        mask = _layer_mask(leaf, sparsity)
        out = leaf * mask.astype(leaf.dtype)
        report[p] = float(1.0 - np.mean(np.asarray(mask)))
        return out

    pruned = jax.tree_util.tree_map_with_path(prune, params)
    return pruned, report


@dataclass(frozen=True)
class PolynomialDecaySchedule:
    """tfmot PolynomialDecay: ramp sparsity from initial to final.

    s(t) = final + (initial - final) * (1 - clip((t-begin)/(end-begin)))^power
    Before begin_step the schedule reports sparsity 0 (no pruning yet).
    """
    initial_sparsity: float = 0.0
    final_sparsity: float = 0.5
    begin_step: int = 0
    end_step: int = 100
    power: int = 3

    def __call__(self, step):
        step = jnp.asarray(step, jnp.float32)
        span = max(self.end_step - self.begin_step, 1)
        frac = jnp.clip((step - self.begin_step) / span, 0.0, 1.0)
        s = (self.final_sparsity +
             (self.initial_sparsity - self.final_sparsity) *
             (1.0 - frac) ** self.power)
        return jnp.where(step >= self.begin_step, s, 0.0)


class MagnitudePruner:
    """Prune-during-training: re-mask params by current magnitude rank.

    Call `prune(params, step)` after each optimizer update (the tfmot
    UpdatePruningStep callback role); pure jnp, jit-safe.
    """

    def __init__(self, schedule: PolynomialDecaySchedule, *,
                 scope: Optional[Callable[[str], bool]] = None):
        self.schedule = schedule
        self.scope = scope

    def prune(self, params, step):
        sparsity = self.schedule(step)

        def apply(path, leaf):
            if not _is_kernel(path, leaf) or (
                    self.scope and not self.scope(_path_str(path))):
                return leaf
            return leaf * _layer_mask(leaf, sparsity).astype(leaf.dtype)

        return jax.tree_util.tree_map_with_path(apply, params)


def mask_like(reference, tree):
    """Zero `tree`'s kernel entries wherever `reference`'s are zero.

    Keeps shadow copies (parameter EMA) consistent with the pruned
    training weights — a dense EMA would silently undo pruning at eval
    time (eval_variables defaults to EMA params).
    """

    def apply(path, ref_leaf, leaf):
        if not _is_kernel(path, ref_leaf):
            return leaf
        return leaf * (ref_leaf != 0).astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(apply, reference, tree)


def sparsity_report(params) -> Dict[str, Any]:
    """Zero-fraction per kernel + overall (pruned-model inspection)."""
    per_layer: Dict[str, float] = {}
    zeros = total = 0

    def visit(path, leaf):
        nonlocal zeros, total
        if _is_kernel(path, leaf):
            arr = np.asarray(leaf)
            z = int((arr == 0).sum())
            per_layer[_path_str(path)] = z / arr.size
            zeros += z
            total += arr.size
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return {"per_layer": per_layer,
            "overall": (zeros / total) if total else 0.0}


def _quantize_method():
    from ..inference import quantize as _q
    return _q


_optimization_methods: Dict[str, Any] = {}


def set_config(configs: Dict[str, Dict[str, Any]]) -> None:
    """tfmot.py:37-43: pre-bind kwargs onto a registry method.

    e.g. ``set_config({'prune': {'sparsity': 0.8}})`` makes
    ``get_method('prune')(params)`` prune at 0.8.
    """
    import functools
    for key, kwargs in configs.items():
        if key == "prune":
            _optimization_methods[key] = functools.partial(
                prune_low_magnitude, **kwargs)
        elif key == "quantize":
            _optimization_methods[key] = functools.partial(
                _quantize_method().quantize_conv_params, **kwargs)
        else:
            raise KeyError(f"only support ['prune', 'quantize'], got {key!r}")


def get_method(method: str):
    """tfmot.py:46-49 registry parity: supported optimization methods."""
    if method in _optimization_methods:
        return _optimization_methods[method]
    if method == "prune":
        return prune_low_magnitude
    if method == "quantize":
        return _quantize_method()
    raise KeyError(f"only support ['prune', 'quantize'], got {method!r}")
