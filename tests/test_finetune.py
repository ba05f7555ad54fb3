"""Fine-tune initialization from pretrained detector checkpoints.

Covers ckpt/finetune.py, the native analog of the reference's two
transfer-learning entry points:

- `--pretrained_ckpt` with exclude_layers=['class_net','box_net']
  (/root/reference/automl/efficientdet/tf2/train.py:255-261) — mode
  "backbone";
- the TF-Hub fine-tune variant `EfficientDetNetTrainHub`
  (/root/reference/automl/efficientdet/tf2/train_lib.py:732-766):
  pretrained trunk incl. the heads' conv repeats, fresh final
  class-predict/box-predict layers for a new num_classes — mode "trunk".

The TF-checkpoint source path is covered in test_ckpt_file_restore.py
(slow tier); here the source is a native pytree checkpoint.
"""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # 90s trained-ckpt module fixture; ckpt-restore smoke lives in test_ckpt_file_restore

from conftest import tiny_config
from mladversarialobjectdetection_tpu.ckpt import finetune
from mladversarialobjectdetection_tpu.ckpt import io as ckpt_io
from mladversarialobjectdetection_tpu.models import efficientdet
from mladversarialobjectdetection_tpu.train.trainer import DetectorTrainer


def _flat(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {"/".join(p.key for p in path): np.asarray(leaf)
            for path, leaf in flat}


@pytest.fixture(scope="module")
def pretrained(tmp_path_factory):
    """A 'pretrained' tiny detector (default 90 classes) saved as a native
    pytree checkpoint, one train step in so BN stats are non-trivial."""
    cfg = tiny_config()
    t = DetectorTrainer(cfg, steps_per_epoch=10)
    state = t.init_state(jax.random.PRNGKey(3))
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3),
                                minval=-1, maxval=1)
    state, _ = jax.jit(t.train_step)(
        state, images, jnp.array([[[8, 8, 40, 40]]] * 2, jnp.float32),
        jnp.zeros((2, 1), jnp.int32), jnp.ones((2, 1), bool))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    path = str(tmp_path_factory.mktemp("pretrained") / "detector")
    ckpt_io.save_pytree(path, variables)
    return cfg, variables, path


def _fresh(num_classes: int, seed: int = 11):
    cfg = tiny_config()
    cfg.num_classes = num_classes
    spec = efficientdet.spec_from_config(cfg)
    net = efficientdet.EfficientDetNet(spec)
    variables = jax.jit(net.init, static_argnames=("training",))(
        {"params": jax.random.PRNGKey(seed)}, jnp.zeros((1, 64, 64, 3)),
        training=False)
    return cfg, spec, dict(variables)


def test_backbone_mode_fresh_heads(pretrained):
    """mode='backbone': trunk restored, BOTH heads entirely fresh
    (tf2/train.py:255-261 exclude_layers parity)."""
    _, saved, path = pretrained
    cfg, spec, fresh = _fresh(num_classes=3)
    out = finetune.restore_pretrained(fresh, path, cfg, spec,
                                      mode="backbone")
    saved_f, fresh_f, out_f = _flat(saved), _flat(fresh), _flat(out)
    n_restored = n_fresh_head = 0
    for key, val in out_f.items():
        if "class_net" in key or "box_net" in key:
            np.testing.assert_array_equal(val, fresh_f[key], err_msg=key)
            n_fresh_head += 1
        else:
            np.testing.assert_array_equal(val, saved_f[key], err_msg=key)
            n_restored += 1
    assert n_restored > 50 and n_fresh_head > 10


def test_trunk_mode_fresh_predict_only(pretrained):
    """mode='trunk' (the TF-Hub analog): head conv repeats pretrained,
    only the final predict layers fresh — and sized for the NEW
    num_classes despite the checkpoint's 90."""
    _, saved, path = pretrained
    cfg, spec, fresh = _fresh(num_classes=3)
    out = finetune.restore_pretrained(fresh, path, cfg, spec, mode="trunk")
    saved_f, fresh_f, out_f = _flat(saved), _flat(fresh), _flat(out)
    n_pred = 0
    for key, val in out_f.items():
        head = "class_net" in key or "box_net" in key
        if head and "predict" in key:
            np.testing.assert_array_equal(val, fresh_f[key], err_msg=key)
            n_pred += 1
        else:
            # head conv repeats + their BN stats come from the checkpoint
            np.testing.assert_array_equal(val, saved_f[key], err_msg=key)
    assert n_pred >= 4  # dw/pw kernels + bias for both heads
    # class predict output width reflects num_classes=3
    pred = out["params"]["class_net"]["predict"]
    width = jax.tree.leaves(pred)[-1].shape[-1]
    assert width == 3 * spec.num_anchors


def test_missing_and_mismatched_leaves_keep_fresh(pretrained):
    """util_keras.restore_ckpt skip semantics: leaves absent from the
    checkpoint or shape-mismatched keep their fresh init; everything
    else still restores."""
    _, saved, _ = pretrained
    cfg, spec, fresh = _fresh(num_classes=90)
    loaded = copy.deepcopy(jax.tree.map(np.asarray, saved))
    # remove one backbone subtree ...
    victim = sorted(loaded["params"]["backbone"])[0]
    del loaded["params"]["backbone"][victim]
    # ... and corrupt one resample leaf's shape
    node, corrupt_path = loaded["params"]["resample_p6"], "params/resample_p6"
    while isinstance(next(iter(node.values())), dict):
        key = sorted(node)[0]
        node, corrupt_path = node[key], f"{corrupt_path}/{key}"
    corrupt = sorted(node)[0]
    corrupt_path = f"{corrupt_path}/{corrupt}"
    node[corrupt] = np.zeros(node[corrupt].shape + (2,), np.float32)
    out = finetune.merge_pretrained(fresh, loaded, mode="trunk")
    out_f, fresh_f, saved_f = _flat(out), _flat(fresh), _flat(saved)
    n_kept_fresh = 0
    for key, val in out_f.items():
        missing = key.startswith(f"params/backbone/{victim}/")
        if missing or key == corrupt_path:
            np.testing.assert_array_equal(val, fresh_f[key], err_msg=key)
            n_kept_fresh += 1
        elif "predict" not in key:
            np.testing.assert_array_equal(val, saved_f[key], err_msg=key)
    assert n_kept_fresh >= 2


@pytest.mark.slow  # heavy numerics golden: slow tier (covered by test_backbone_mode_fresh_heads fast)
def test_train_step_after_trunk_finetune(pretrained):
    """A fine-tuned state trains: one supervised step on the new
    3-class head updates params and yields a finite loss."""
    _, _, path = pretrained
    cfg, spec, _ = _fresh(num_classes=3)
    t = DetectorTrainer(cfg, steps_per_epoch=10)
    state = t.init_state(jax.random.PRNGKey(5))
    variables = finetune.restore_pretrained(
        {"params": state.params, "batch_stats": state.batch_stats},
        path, cfg, spec, mode="trunk")
    state = state._replace(
        params=variables["params"], batch_stats=variables["batch_stats"],
        ema_params=jax.tree.map(jnp.copy, variables["params"]))
    images = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3),
                                minval=-1, maxval=1)
    st2, metrics = jax.jit(t.train_step)(
        state, images, jnp.array([[[8, 8, 40, 40]]] * 2, jnp.float32),
        jnp.ones((2, 1), jnp.int32), jnp.ones((2, 1), bool))
    assert np.isfinite(float(metrics["loss"]))
    p0 = _flat(state.params)
    p1 = _flat(st2.params)
    changed = [k for k in p0 if not np.allclose(p0[k], p1[k])]
    assert any("predict" in k for k in changed)


def test_invalid_mode_rejected(pretrained):
    _, saved, _ = pretrained
    with pytest.raises(ValueError, match="finetune mode"):
        finetune.merge_pretrained(saved, saved, mode="banana")
