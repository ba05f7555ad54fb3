"""Fixed-shape NMS tests (reference tf2/postprocess_test.py:48-205 patterns)."""
import jax.numpy as jnp
import numpy as np

from mladversarialobjectdetection_tpu.ops import nms


def test_iou_basic():
    a = jnp.array([[0, 0, 10, 10]], jnp.float32)
    b = jnp.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                  jnp.float32)
    out = np.asarray(nms.iou(a, b))[0]
    assert np.allclose(out, [1.0, 25 / 175, 0.0], atol=1e-6)


def test_hard_nms_suppression():
    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]],
                      jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7], jnp.float32)
    r = nms.nms_padded(boxes, scores, method="hard", iou_thresh=0.5,
                       score_thresh=0.1, max_output_size=3)
    assert int(r.valid_len) == 2
    assert list(np.asarray(r.indices[:2])) == [0, 2]
    assert np.allclose(r.scores[:2], [0.9, 0.7])
    # padded slots zeroed
    assert float(r.scores[2]) == 0.0 and not bool(r.valid[2])


def test_soft_nms_decay():
    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
    scores = jnp.array([0.9, 0.8], jnp.float32)
    r = nms.nms_padded(boxes, scores, method="gaussian", score_thresh=0.001,
                       sigma=0.5, max_output_size=2)
    assert int(r.valid_len) == 2
    iou = float(nms.iou(boxes[:1], boxes[1:2])[0, 0])
    expected = 0.8 * np.exp(-iou * iou / 0.5)
    assert np.isclose(float(r.scores[1]), expected, atol=1e-5)


def test_soft_nms_score_thresh_cut():
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.array([0.9, 0.8], jnp.float32)
    # identical boxes: decay = exp(-1/sigma); with small sigma the second
    # drops below the threshold and must be invalid
    r = nms.nms_padded(boxes, scores, method="gaussian", score_thresh=0.5,
                       sigma=0.1, max_output_size=2)
    assert int(r.valid_len) == 1


def test_masked_candidates_ignored():
    boxes = jnp.zeros((4, 4), jnp.float32)
    scores = jnp.array([nms.NEG_INF, nms.NEG_INF, 0.6, nms.NEG_INF])
    r = nms.nms_padded(boxes, scores, method="hard", score_thresh=0.1,
                       max_output_size=4)
    assert int(r.valid_len) == 1
    assert int(r.indices[0]) == 2


def test_batched_nms_shapes():
    boxes = jnp.zeros((3, 8, 4), jnp.float32)
    scores = jnp.full((3, 8), 0.9)
    r = nms.batched_nms(boxes, scores, method="hard", iou_thresh=0.5,
                        score_thresh=0.5, max_output_size=5)
    assert r.boxes.shape == (3, 5, 4)
    assert r.valid.shape == (3, 5)
    # all-zero boxes have zero area -> IoU 0 -> nothing suppressed
    assert int(r.valid_len[0]) == 5


def test_pallas_nms_matches_reference():
    """Single-kernel pallas suppression loop == ops/nms.py selection,
    bit-for-bit (interpret mode; also verified on hardware)."""
    import numpy as np
    from mladversarialobjectdetection_tpu.ops import pallas_nms
    old = pallas_nms._INTERPRET
    pallas_nms._INTERPRET = True
    try:
        rng = np.random.RandomState(0)
        b, n, m = 3, 128, 32
        centers = rng.uniform(30, 300, (b, n, 2))
        sizes = rng.uniform(10, 80, (b, n, 2))
        boxes = jnp.asarray(np.concatenate(
            [centers - sizes / 2, centers + sizes / 2], -1).astype(np.float32))
        scores = jnp.asarray(rng.uniform(0.05, 1.0, (b, n)).astype(np.float32))
        for kw in (dict(method="hard", iou_thresh=0.5, score_thresh=0.3,
                        max_output_size=m),
                   dict(method="gaussian", sigma=0.5, score_thresh=0.2,
                        max_output_size=m)):
            ref = nms.batched_nms(boxes, scores, **kw)
            out = pallas_nms.batched_nms_pallas(boxes, scores, **kw)
            assert jnp.array_equal(ref.indices, out.indices)
            assert jnp.array_equal(ref.valid, out.valid)
            assert jnp.allclose(ref.scores, out.scores, atol=1e-6)
            assert jnp.array_equal(ref.valid_len, out.valid_len)
    finally:
        pallas_nms._INTERPRET = old
