"""Detector serving wrapper + postprocess pipeline tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mladversarialobjectdetection_tpu as mad
from mladversarialobjectdetection_tpu.ops import postprocess
from mladversarialobjectdetection_tpu.ops.preprocess import (preprocess_host,
                                                             preprocess_jax)


def test_preprocess_host_scale():
    frame = np.full((100, 50, 3), 255, np.uint8)
    out, scale_back = preprocess_host(frame, 64, 127.0, 128.0)
    assert out.shape == (64, 64, 3)
    assert scale_back == pytest.approx(100 / 64)
    # content occupies 64 x 32, right half zero-padded
    assert np.allclose(out[:, 33:, :], 0.0)
    assert out[:, :31, :].mean() == pytest.approx(1.0, abs=1e-3)


def test_preprocess_jax_matches_host():
    # smooth gradient: isolates scale/pad/normalize parity from the
    # resize-kernel difference (cv2 INTER_LINEAR vs jax antialiased bilinear)
    yy, xx = np.meshgrid(np.arange(80), np.arange(60), indexing="ij")
    frame = np.stack([yy * 3, xx * 4, yy + xx], -1).astype(np.float32) % 255
    h, sh = preprocess_host(frame, 64, 127.0, 128.0)
    j, sj = preprocess_jax(jnp.asarray(frame), 64, 127.0, 128.0)
    assert float(sj) == pytest.approx(sh)
    # resize kernels differ slightly (cv2 vs jax bilinear); coarse agreement
    assert np.abs(np.asarray(j) - h).mean() < 0.05


def test_postprocess_global_shapes(tiny_detector, rand_images):
    cfg, spec, net, variables = tiny_detector
    cls_out, box_out = jax.jit(lambda v, x: net.apply(v, x, False))(
        variables, rand_images)
    params = cfg.as_dict()
    det = jax.jit(lambda c, b: postprocess.postprocess_global(
        params, c, b, image_scales=jnp.asarray([2.0, 2.0])))(cls_out, box_out)
    m = cfg.nms_configs.max_output_size
    assert det.boxes.shape == (2, m, 4)
    assert det.scores.shape == (2, m)
    assert det.classes.shape == (2, m)
    # classes offset by 1 where valid
    v = np.asarray(det.valid)
    if v.any():
        assert np.asarray(det.classes)[v].min() >= 1
    # boxes clipped to 2x image size (scale 2.0)
    assert float(det.boxes.max()) <= 2 * cfg.image_size + 1e-3


def test_detector_infer_end_to_end(tiny_cfg):
    from mladversarialobjectdetection_tpu.inference.detector import Detector
    det = Detector(model_name="efficientdet-lite0",
                   params={"image_size": 64, "fpn_num_filters": 16,
                           "fpn_cell_repeats": 1, "box_class_repeats": 1,
                           "nms_configs": {"score_thresh": 0.0,
                                           "pre_nms_topk": 64,
                                           "max_output_size": 16}})
    frame = (np.random.default_rng(0).uniform(0, 255, (96, 128, 3))
             .astype(np.uint8))
    bb, sc = det.infer(frame)
    assert isinstance(bb, list) and isinstance(sc, list)
    for b in bb:
        assert len(b) == 4
    for s in sc:
        assert 0.0 <= s <= 1.0


@pytest.mark.slow
def test_detector_per_class_mode():
    from mladversarialobjectdetection_tpu.inference.detector import Detector
    det = Detector(model_name="efficientdet-lite0", post_mode="per_class",
                   params={"image_size": 64, "fpn_num_filters": 16,
                           "fpn_cell_repeats": 1, "box_class_repeats": 1,
                           "nms_configs": {"score_thresh": 0.0,
                                           "pre_nms_topk": 64,
                                           "max_output_size": 16}})
    frame = (np.random.default_rng(1).uniform(0, 255, (64, 64, 3))
             .astype(np.uint8))
    out = det.serve(frame[None])
    assert out.boxes.shape == (1, 16, 4)
    # reference parity: the per_class path does NOT clip boxes to the
    # frame (only the global path does — tf2/postprocess.py per_class vs
    # postprocess_global; pinned in test_postprocess_tf_parity) — decoded
    # boxes may spill past the border but must stay finite and near it
    assert np.isfinite(out.boxes).all()
    assert float(np.abs(out.boxes).max()) <= 2 * 64


@pytest.mark.slow
def test_serve_streams_batched(tmp_path):
    """Multi-stream batched serving: per-stream results equal single-frame
    serving; ended streams yield None while others continue."""
    from PIL import Image
    from mladversarialobjectdetection_tpu.inference.detector import Detector
    from mladversarialobjectdetection_tpu.inference.streaming import Stream

    rng = np.random.default_rng(3)
    dirs = []
    for n in (3, 1):  # stream 1 ends after the first tick
        d = tmp_path / f"s{n}"
        d.mkdir()
        for i in range(n):
            Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
                            ).save(d / f"{i:02d}.png")
        dirs.append(str(d))

    det = Detector(model_name="efficientdet-lite0",
                   params={"image_size": 64, "fpn_num_filters": 16,
                           "fpn_cell_repeats": 1, "box_class_repeats": 1,
                           "nms_configs": {"score_thresh": 0.0,
                                           "pre_nms_topk": 64,
                                           "max_output_size": 16}})
    streams = [Stream(d, frame_delay=0, set_width=64) for d in dirs]
    ticks = list(det.serve_streams(streams))
    assert len(ticks) == 3
    # tick 0: both live; later ticks: stream 1 ended
    assert ticks[0][0] is not None and ticks[0][1] is not None
    assert ticks[1][1] is None and ticks[2][1] is None
    assert ticks[1][0] is not None

    # per-stream results must match single-frame serving of the same frame
    frame0 = next(Stream(dirs[0], frame_delay=0, set_width=64).play())
    solo = det.serve(np.asarray(frame0)[None])
    np.testing.assert_allclose(ticks[0][0].scores, solo.scores[0],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ticks[0][0].boxes, solo.boxes[0],
                               rtol=1e-4, atol=1e-3)


@pytest.mark.slow
def test_serve_pipelined_matches_serve():
    """Pipelined streaming serve must yield exactly serve()'s per-frame
    results, in order, including the padded final partial batch."""
    from mladversarialobjectdetection_tpu.inference.detector import Detector

    det = Detector(model_name="efficientdet-lite0",
                   params={"image_size": 64, "fpn_num_filters": 16,
                           "fpn_cell_repeats": 1, "box_class_repeats": 1,
                           "nms_configs": {"score_thresh": 0.0,
                                           "pre_nms_topk": 64,
                                           "max_output_size": 16}})
    rng = np.random.default_rng(9)
    frames = [rng.uniform(0, 255, (48 + 8 * i, 64, 3)).astype(np.uint8)
              for i in range(5)]  # 5 frames, batch 2 -> padded last batch

    piped = list(det.serve_pipelined(iter(frames), batch_size=2))
    assert len(piped) == 5
    ref = det.serve(frames)
    for i, d in enumerate(piped):
        np.testing.assert_allclose(d.scores, ref.scores[i], atol=1e-6)
        np.testing.assert_allclose(d.boxes, ref.boxes[i], atol=1e-4)
        assert int(d.valid_len) == int(ref.valid_len[i])

    # device-preprocess pipelined mode (fixed shape): == device serve
    same = [f[:48] for f in frames]  # equal shapes
    piped_d = list(det.serve_pipelined(iter(same), batch_size=2,
                                       device_preprocess=True))
    ref_d = det.serve(np.stack(same), device_preprocess=True)
    assert len(piped_d) == 5
    for i, d in enumerate(piped_d):
        np.testing.assert_allclose(d.scores, ref_d.scores[i], atol=1e-6)
        assert int(d.valid_len) == int(ref_d.valid_len[i])


@pytest.mark.slow
def test_serve_device_preprocess_matches_host():
    """On-device uint8 preprocessing path == host preprocessing path
    (jax.image.resize vs the host resize agree to float tolerance)."""
    from mladversarialobjectdetection_tpu.inference.detector import Detector
    det = Detector(model_name="efficientdet-lite0",
                   params={"image_size": 64, "fpn_num_filters": 16,
                           "fpn_cell_repeats": 1, "box_class_repeats": 1,
                           "nms_configs": {"score_thresh": 0.0,
                                           "pre_nms_topk": 64,
                                           "max_output_size": 16}})
    rng = np.random.default_rng(13)
    frames = rng.integers(0, 255, (2, 96, 128, 3)).astype(np.uint8)
    host = det.serve(frames)
    dev = det.serve(frames, device_preprocess=True)
    np.testing.assert_allclose(dev.scores, host.scores, atol=2e-3)
    np.testing.assert_allclose(dev.boxes, host.boxes, atol=0.5)
    np.testing.assert_array_equal(dev.valid_len, host.valid_len)
