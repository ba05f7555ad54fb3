"""Fine-tune initialization from a pretrained detector checkpoint.

Two reference-parity modes, selected by `mode`:

- ``"backbone"`` — restore everything EXCEPT the class/box heads, which
  keep their fresh initialization. This is the reference's
  ``--pretrained_ckpt`` path: ``restore_ckpt(..., exclude_layers=
  ['class_net', 'optimizer', 'box_net'])``
  (/root/reference/automl/efficientdet/tf2/train.py:255-261).
- ``"trunk"`` — restore everything EXCEPT the heads' final ``predict``
  layers. This is the native analog of the TF-Hub fine-tune variant
  ``EfficientDetNetTrainHub``
  (/root/reference/automl/efficientdet/tf2/train_lib.py:732-766): there
  the hub SavedModel supplies the pretrained trunk *including* the head
  conv repeats, and only fresh ``class_net/class-predict`` /
  ``box_net/box-predict`` layers are stacked on top — the path used to
  fine-tune onto a dataset with a different ``num_classes``. Instead of
  a hub URL, any detector checkpoint (native pytree or reference TF1
  tarball/dir) is the trunk source.

Leaves that are missing from the checkpoint or shape-mismatched keep
their fresh initialization (the skip semantics of
util_keras.restore_ckpt, util_keras.py:108-203) — in particular the
class-predict layer of a checkpoint trained with a different
``num_classes`` never blocks a trunk restore.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from ..utils.log import get_logger

logger = get_logger(__name__)

_HEADS = ("class_net", "box_net")


def _excluded(mode: str, path: Tuple[str, ...]) -> bool:
    head = any(h in path for h in _HEADS)
    if mode == "backbone":
        return head
    if mode == "trunk":
        return head and "predict" in path
    raise ValueError(f"unknown finetune mode {mode!r} "
                     "(expected 'backbone' or 'trunk')")


def _dig(tree: Any, path: Tuple[str, ...]):
    for key in path:
        if not isinstance(tree, dict) or key not in tree:
            raise KeyError("/".join(path))
        tree = tree[key]
    return tree


def merge_pretrained(fresh_variables: Dict[str, Any], loaded: Dict[str, Any],
                     mode: str = "backbone") -> Dict[str, Any]:
    """Merge a loaded variables pytree (nested dicts of arrays) into a
    fresh one, excluding the mode's fine-tune layers and skipping
    missing/mismatched leaves."""
    import jax

    out = {}
    restored = skipped = 0
    for collection, tree in fresh_variables.items():
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        new_leaves = []
        for pathkeys, leaf in flat:
            path = tuple(p.key for p in pathkeys)
            fresh = np.asarray(leaf)
            if _excluded(mode, path):
                new_leaves.append(fresh)
                continue
            try:
                arr = np.asarray(_dig(loaded.get(collection, {}), path))
            except KeyError:
                logger.info(f"finetune: no {collection}/{'/'.join(path)} "
                            "in checkpoint, keeping fresh init")
                skipped += 1
                new_leaves.append(fresh)
                continue
            if arr.shape != fresh.shape:
                logger.info(
                    f"finetune: shape mismatch {collection}/"
                    f"{'/'.join(path)} ckpt {arr.shape} vs model "
                    f"{fresh.shape}, keeping fresh init")
                skipped += 1
                new_leaves.append(fresh)
                continue
            restored += 1
            new_leaves.append(arr.astype(fresh.dtype))
        out[collection] = jax.tree_util.tree_unflatten(treedef, new_leaves)
    logger.info(f"finetune({mode}): restored {restored} leaves, "
                f"kept {skipped} fresh (+ excluded head layers)")
    return out


def restore_pretrained(fresh_variables: Dict[str, Any], ckpt_path: str,
                       config, spec, *, mode: str = "backbone"
                       ) -> Dict[str, Any]:
    """Restore `ckpt_path` (native pytree checkpoint, reference TF1
    checkpoint dir/prefix, or GCS-layout tarball) into `fresh_variables`
    under the mode's exclude rules."""
    from . import convert_tf
    from . import io as ckpt_io

    _excluded(mode, ())  # validate mode before any IO
    tf_prefix = convert_tf.find_tf_checkpoint(ckpt_path)
    if tf_prefix:
        tf_weights = convert_tf.load_tf_checkpoint(tf_prefix)
        variables = convert_tf.convert_tf_weights(
            tf_weights, config, spec, fresh_variables,
            skip=lambda coll, path: _excluded(mode, path), strict=False)
        logger.info(f"finetune({mode}): from TF checkpoint {tf_prefix}")
        return variables
    loaded = ckpt_io.load_pytree(ckpt_path)
    logger.info(f"finetune({mode}): from native checkpoint {ckpt_path}")
    return merge_pretrained(fresh_variables, loaded, mode)
