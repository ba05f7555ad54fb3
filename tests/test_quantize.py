"""int8 post-training-quantized serving path (inference/quantize.py).

Mirrors the reference's INT8 accuracy contract (its int8 TFLite export
loses .35 mAP vs float, automl README lite4 row): quantized forward must
track the float forward closely, and the serve surface must stay
drop-in. Perf on the current chip generation is a measured negative
(tools/bench_int8_conv.py; BENCH_NOTES) — this mode is a capability,
exercised here for correctness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mladversarialobjectdetection_tpu.inference import quantize


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _frames(rng, n, hw=(80, 60)):
    return [rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
            for _ in range(n)]


@pytest.fixture(scope="module")
def int8_detector(rng):
    from mladversarialobjectdetection_tpu.inference.detector import Detector
    det = Detector(
        model_name="efficientdet-lite0",
        params={"image_size": 64, "fpn_num_filters": 16,
                "fpn_cell_repeats": 1, "box_class_repeats": 1,
                "nms_configs": {"score_thresh": 0.0, "pre_nms_topk": 64,
                                "max_output_size": 16}})
    float_forward = det._forward          # (state, images) -> outputs
    float_state = det._forward_state      # == det.variables
    det.quantize_int8(_frames(rng, 16))
    return det, float_forward, float_state


@pytest.mark.slow
def test_forward_tracks_float(int8_detector, rng):
    det, float_forward, float_state = int8_detector
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    f_cls, f_box = jax.jit(float_forward)(float_state, x)
    q_cls, q_box = jax.jit(det._forward)(det._forward_state, x)
    for fc, qc in zip(f_cls, q_cls):
        # class outputs are logits -> compare at probability level
        d = np.abs(jax.nn.sigmoid(fc.astype(jnp.float32))
                   - jax.nn.sigmoid(qc.astype(jnp.float32)))
        assert float(np.max(np.asarray(d))) < 5e-3
    for fb, qb in zip(f_box, q_box):
        d = np.abs(np.asarray(fb, np.float32) - np.asarray(qb, np.float32))
        assert float(d.max()) < 0.1  # anchor-relative units


@pytest.mark.slow
def test_serve_drop_in(int8_detector, rng):
    det, float_forward, float_state = int8_detector
    frames = _frames(rng, 2)
    qd = det.serve(frames)
    assert qd.boxes.shape[0] == 2
    # scores after NMS track the float path closely (box identity can
    # legitimately reorder among near-tied random-init detections)
    det._forward = float_forward
    det._forward_state = float_state
    det._serve = jax.jit(det._serve_impl)
    fd = det.serve(frames)
    det.quantize_int8(_frames(rng, 8))
    assert float(np.abs(np.asarray(fd.scores)
                        - np.asarray(qd.scores)).max()) < 5e-3


@pytest.mark.slow
def test_quantized_conv_count_and_skip(int8_detector):
    det, _, _ = int8_detector
    qkernels = det._forward_state["qkernels"]
    assert len(qkernels) > 50  # backbone + fpn + head bodies
    assert all("predict" not in p for p in qkernels)
    # head body convs ARE quantized (shared across levels)
    assert any(p.startswith("class_net/") for p in qkernels)
    # per-output-channel scales have the right shape
    for p, (k, s) in qkernels.items():
        assert k.dtype == jnp.int8 and s.shape == (k.shape[-1],)
        assert int(jnp.max(jnp.abs(k))) <= 127


@pytest.mark.slow
def test_requires_frames(int8_detector):
    det, _, _ = int8_detector
    with pytest.raises(ValueError):
        det.quantize_int8([])


@pytest.mark.slow
def test_export_path_stays_float_after_quantize(int8_detector, rng):
    """export() traces _serve_float_impl: after quantize_int8 the export
    function must still be the FLOAT serve program (the documented
    'export() is unchanged' contract), not the int8 interceptor graph."""
    det, float_forward, float_state = int8_detector
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    scales = jnp.ones((1,), jnp.float32)
    exp = jax.jit(det._serve_float_impl)(x, scales)
    int8_forward, int8_state = det._forward, det._forward_state
    det._forward, det._forward_state = float_forward, float_state
    ref = jax.jit(det._serve_impl)(float_state, x, scales)
    det._forward, det._forward_state = int8_forward, int8_state
    np.testing.assert_array_equal(np.asarray(exp.scores),
                                  np.asarray(ref.scores))
    np.testing.assert_array_equal(np.asarray(exp.boxes),
                                  np.asarray(ref.boxes))


def test_per_channel_roundtrip(rng):
    """quantize_conv_params inverts to the float kernel within 1 LSB."""
    k = rng.standard_normal((3, 3, 8, 16)).astype(np.float32)
    variables = {"params": {"m": {"kernel": k}}}
    q = quantize.quantize_conv_params(variables, ["m"])
    k_q, s = q["m"]
    recon = np.asarray(k_q, np.float32) * np.asarray(s)
    assert np.abs(recon - k).max() <= np.asarray(s).max() * 0.5 + 1e-7
