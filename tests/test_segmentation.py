"""Segmentation training (tf2/segmentation.py analog) tests."""
import numpy as np
import pytest

import mladversarialobjectdetection_tpu as mad
from mladversarialobjectdetection_tpu.train import segmentation as seg


def test_output_size_chain():
    # (s-1)//2+1 chain down to min_level, then the final stride-2 transpose
    assert seg.output_size(512, 3) == 128  # the reference demo's mask res
    assert seg.output_size(128, 3) == 32
    assert seg.output_size(64, 3) == 16


def test_synthetic_masks_follow_images():
    b = next(seg.synthetic_seg_batches(2, 64, 16, seed=3))
    assert b["images"].shape == (2, 64, 64, 3)
    assert b["masks"].shape == (2, 16, 16)
    assert set(np.unique(b["masks"])) <= {0, 1, 2}
    # object pixels are bright, background dark — the task is learnable
    idx = (np.arange(16) * 4).astype(int)
    small = b["images"][:, idx][:, :, idx]
    obj = small[b["masks"] == 1].mean()
    bg = small[b["masks"] == 0].mean()
    assert obj > 0.2 and bg < -0.5


@pytest.mark.slow
def test_segmentation_training_converges(tmp_path):
    over = {"fpn_num_filters": 16, "fpn_cell_repeats": 1,
            "box_class_repeats": 1, "seg_num_classes": 3}
    state, metrics = seg.train(
        "efficientdet-lite0", image_size=64, batch_size=4, steps=60,
        log_every=30, model_dir=str(tmp_path / "seg"),
        config_override=over)
    assert np.isfinite(metrics["loss"])
    assert metrics["val_accuracy"] > 0.80
    # the checkpoint round-trips
    from mladversarialobjectdetection_tpu.ckpt import io as ckpt_io
    tree = ckpt_io.load_pytree(str(tmp_path / "seg" / "segmentation"))
    assert "params" in tree and "batch_stats" in tree
    # predict_mask returns class ids at the logits grid
    trainer = seg.SegmentationTrainer(_cfg(over))
    batch = next(seg.synthetic_seg_batches(2, 64, 16, seed=9))
    masks = trainer.predict_mask(
        seg.SegTrainState(tree["params"], tree["batch_stats"], None, 0),
        batch["images"])
    assert masks.shape == (2, 16, 16)


def _cfg(over):
    cfg = mad.get_efficientdet_config("efficientdet-lite0")
    cfg.image_size = 64
    cfg.update(over)
    return cfg
