"""Demo-layer integration tests: streaming from a directory, CPU patch
mirror, and the demo_v2 per-frame pipeline on a tiny detector."""
import os

import numpy as np
import pytest


@pytest.fixture()
def frame_dir(tmp_path):
    from PIL import Image
    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
                        ).save(d / f"{i:03d}.png")
    return str(d)


def test_stream_from_dir(frame_dir):
    from mladversarialobjectdetection_tpu.inference.streaming import Stream
    s = Stream(frame_dir, set_width=32, frame_delay=0)
    frames = list(s.play())
    assert len(frames) == 3
    assert frames[0].shape[1] == 32


def test_adv_patch_cpu_mirror():
    from mladversarialobjectdetection_tpu.inference.adv_patch import \
        AdversarialPatch
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (128, 128, 3)).astype(np.uint8)
    ap = AdversarialPatch(scale=0.5, h=128, w=128)
    out = ap.add_adv_to_img(img, [(20, 20, 100, 90)])
    assert out.shape == img.shape
    assert (out != img).any()
    # patch is centered on the box: corners untouched
    assert (out[:5, :5] == img[:5, :5]).all()


def test_adv_patch_from_array():
    from mladversarialobjectdetection_tpu.inference.adv_patch import \
        AdversarialPatch
    patch = np.zeros((32, 32, 3), np.float32)  # mid-grey in [-1,1]
    ap = AdversarialPatch(scale=0.4, patch_array=patch)
    assert ap._patch_img.shape == (32, 32, 3)


@pytest.mark.slow
def test_demo_v2_pipeline(tmp_path, frame_dir):
    """Full demo_v2.main on a tiny random detector: writes clean/adv mp4s."""
    cv2 = pytest.importorskip("cv2")
    from mladversarialobjectdetection_tpu.demo import demo_v2

    # shrink the detector via the Detector params override
    import mladversarialobjectdetection_tpu.demo.demo_v2 as dv2
    from mladversarialobjectdetection_tpu.inference.detector import Detector

    save_dir = str(tmp_path / "out")
    detector = Detector(
        model_name="efficientdet-lite0",
        params={"image_size": 64, "fpn_num_filters": 16,
                "fpn_cell_repeats": 1, "box_class_repeats": 1,
                "nms_configs": {"iou_thresh": 0.5, "score_thresh": 0.0,
                                "pre_nms_topk": 64, "max_output_size": 8}})
    from mladversarialobjectdetection_tpu.inference.adv_patch import \
        AdversarialPatch
    from mladversarialobjectdetection_tpu.inference.streaming import Stream

    stream = Stream(frame_dir, set_width=64, frame_delay=0)
    adv = AdversarialPatch(scale=0.4, h=64, w=64)
    clean = dv2.Demo(detector)
    attack = dv2.AttackDemo(adv, detector)
    os.makedirs(save_dir, exist_ok=True)
    n = 0
    for frame in stream.play():
        out, bb, sc, _ = clean.run(frame)
        assert out.shape == frame.shape
        adv_out, attacked, adv_score = attack.run(frame, bb)
        assert adv_out.shape == frame.shape
        n += 1
    assert n == 3
