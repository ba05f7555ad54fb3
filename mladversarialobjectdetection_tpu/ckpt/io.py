"""Native checkpoint I/O (orbax-backed with a msgpack fallback).

Replaces the reference's three checkpoint formats (SURVEY.md §5): detector
variables are stored as an orbax PyTree checkpoint; attack patch artifacts
live in attack/artifacts.py; defender weights use the same PyTree format
(replacing antipatch.h5, attack_detection.py:311-318).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _to_numpy(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_pytree(path: str, tree: Any) -> None:
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, _to_numpy(tree), force=True)
    except Exception:
        import pickle
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path + ".pkl", "wb") as f:
            pickle.dump(_to_numpy(tree), f)


def save_state_bytes(path: str, state: Any) -> None:
    """Structure-preserving state serialization (flax msgpack) — for full
    training states whose pytrees contain optimizer namedtuples that a
    generic PyTree restore would flatten into dicts."""
    from flax import serialization
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(_to_numpy(state)))


def load_state_bytes(path: str, template: Any) -> Any:
    """Restore bytes into the template's exact pytree structure."""
    from flax import serialization
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def load_pytree(path: str) -> Any:
    path = os.path.abspath(path)
    if os.path.isdir(path):
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(path)
    if os.path.exists(path + ".pkl"):
        import pickle
        with open(path + ".pkl", "rb") as f:
            return pickle.load(f)
    raise FileNotFoundError(path)
