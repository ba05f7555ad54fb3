"""Export path tests (infer_lib export parity patterns,
model_inspect_test.py:63-169 / infer_lib_test.py:40-126 shapes)."""
import numpy as np
import pytest


def test_stablehlo_roundtrip(tmp_path):
    import jax.numpy as jnp
    from mladversarialobjectdetection_tpu.inference import export

    def fn(x):
        return jnp.tanh(x) * 2.0

    x = np.ones((2, 4), np.float32)
    path = str(tmp_path / "fn.stablehlo")
    export.export_stablehlo(fn, (x,), path)
    loaded = export.load_stablehlo(path)
    out = loaded(x)
    assert np.allclose(np.asarray(out), np.tanh(x) * 2.0, atol=1e-6)


def test_stablehlo_detector(tmp_path, tiny_detector, rand_images):
    from mladversarialobjectdetection_tpu.inference import export
    from mladversarialobjectdetection_tpu.ops import postprocess

    cfg, spec, net, variables = tiny_detector
    params = cfg.as_dict()

    def fwd(images):
        cls_out, box_out = net.apply(variables, images, False)
        det = postprocess.postprocess_global(params, cls_out, box_out)
        return det.boxes, det.scores, det.valid_len

    path = str(tmp_path / "det.stablehlo")
    export.export_stablehlo(fwd, (np.asarray(rand_images),), path)
    loaded = export.load_stablehlo(path)
    boxes, scores, valid_len = loaded(np.asarray(rand_images))
    ref_boxes, ref_scores, ref_valid = fwd(rand_images)
    assert np.allclose(np.asarray(boxes), np.asarray(ref_boxes), atol=1e-4)
    assert np.allclose(np.asarray(scores), np.asarray(ref_scores), atol=1e-5)
