"""End-to-end smoke of the attack/defense training drivers (tiny scale,
synthetic data, full epoch loop incl. artifacts + plateau + logging)."""
import glob
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

TINY = {"fpn_num_filters": 16, "fpn_cell_repeats": 1, "box_class_repeats": 1,
        "nms_configs": {"pre_nms_topk": 64, "max_output_size": 16},
        "max_boxes_per_image": 4}


def test_attack_train_driver(tmp_path):
    from mladversarialobjectdetection_tpu.attack import train as attack_train
    save_dir = str(tmp_path / "attack")
    state = attack_train.train(
        "efficientdet-lite0", synthetic=True, image_size=64,
        batch_size=2, epochs=2, steps_per_epoch=2, save_dir=save_dir,
        config_override=TINY, patch_size=32, visualize_freq=0)
    assert np.asarray(state.patch).shape == (32, 32, 3)
    # per-epoch artifact dirs in the reference naming scheme
    dirs = glob.glob(os.path.join(save_dir, "patch_*_*"))
    assert dirs, "no patch artifact saved"
    assert os.path.exists(os.path.join(sorted(dirs)[0], "scale.txt"))
    assert os.path.exists(os.path.join(save_dir, "logs", "metrics.jsonl"))


def test_defense_train_driver(tmp_path):
    from mladversarialobjectdetection_tpu.defense import train as defense_train
    save_dir = str(tmp_path / "defense")
    state = defense_train.train(
        "efficientdet-lite0", synthetic=True, image_size=64,
        batch_size=2, epochs=1, steps_per_epoch=2, save_dir=save_dir,
        config_override=TINY)
    assert int(state.step) == 2
    out = glob.glob(os.path.join(save_dir, "patch_*_*"))
    assert out, "no defender checkpoint saved"
