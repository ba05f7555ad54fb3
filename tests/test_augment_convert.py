"""GridMask/Mosaic augmentation + COCO->TFRecord converter tests."""
import json
import os

import jax
import numpy as np
import pytest

from mladversarialobjectdetection_tpu.data import augment, create_coco_tfrecord, tfrecord


def test_gridmask():
    key = jax.random.PRNGKey(0)
    imgs = jax.numpy.ones((2, 64, 64, 3))
    out = augment.gridmask(key, imgs, ratio=0.5, fill_value=0.0)
    frac = float(out.mean())
    assert 0.3 < frac < 1.0          # some pixels masked, not all
    assert out.shape == imgs.shape


def test_mosaic():
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (40 + 8 * i, 50, 3), np.uint8)
            for i in range(4)]
    boxes = [np.array([[5, 5, 30, 40]], np.float32) for _ in range(4)]
    classes = [np.array([1]) for _ in range(4)]
    img, bx, cl = augment.mosaic(rng, imgs, boxes, classes, out_size=96)
    assert img.shape == (96, 96, 3)
    assert bx.shape[1] == 4 and len(bx) == len(cl)
    assert (bx[:, 2] >= bx[:, 0]).all() and (bx[:, 3] >= bx[:, 1]).all()
    assert bx.min() >= 0 and bx.max() <= 96


def test_coco_convert_roundtrip(tmp_path):
    from PIL import Image
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(3):
        name = f"img{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (60, 80, 3), np.uint8)).save(
            img_dir / name)
        images.append({"id": i, "file_name": name, "height": 60, "width": 80})
        annotations.append({"image_id": i, "bbox": [8, 6, 40, 30],
                            "category_id": 1, "iscrowd": 0})
    ann_file = tmp_path / "instances.json"
    ann_file.write_text(json.dumps({"images": images,
                                    "annotations": annotations}))
    prefix = str(tmp_path / "coco")
    n = create_coco_tfrecord.convert(str(ann_file), str(img_dir), prefix,
                                     num_shards=2)
    assert n == 3
    reader = tfrecord.DetectionTFRecordReader(
        prefix + "-*.tfrecord", image_size=64, mean_rgb=127.0,
        stddev_rgb=128.0, max_instances=4, shuffle=False)
    batch = next(reader.batches(2))
    assert batch["images"].shape == (2, 64, 64, 3)
    assert batch["valid"][:, 0].all()
    # bbox [x=8,y=6,w=40,h=30] on 80x60 -> normalized then scaled to 64-pad
    # image (scale .8): ymin=6*.8=4.8, xmin=6.4, ymax=28.8, xmax=38.4
    assert np.allclose(batch["boxes"][0, 0], [4.8, 6.4, 28.8, 38.4],
                       atol=0.05)


def test_autoaugment_ops():
    from mladversarialobjectdetection_tpu.data import autoaugment as aa
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    boxes = np.array([[10, 10, 40, 30]], np.float32)
    for name in ("Equalize", "Color", "Contrast", "Brightness", "Sharpness",
                 "Solarize", "Posterize", "Cutout"):
        out, b2 = aa._apply_op(rng, img, boxes, name, 6.0)
        assert out.shape == img.shape and out.dtype == np.uint8
        assert np.allclose(b2, boxes)  # pixel ops never move boxes
    for name in ("TranslateX_BBox", "TranslateY_BBox", "ShearX_BBox",
                 "ShearY_BBox", "Rotate_BBox"):
        out, b2 = aa._apply_op(rng, img, boxes, name, 6.0)
        assert out.shape == img.shape
        assert b2.shape == boxes.shape
        assert (b2[:, 2] >= b2[:, 0]).all() and (b2[:, 3] >= b2[:, 1]).all()
        assert b2.min() >= 0 and b2[:, 0::2].max() <= 64


def test_autoaugment_translate_moves_boxes():
    from mladversarialobjectdetection_tpu.data import autoaugment as aa
    img = np.zeros((64, 64, 3), np.uint8)
    boxes = np.array([[10, 10, 30, 30]], np.float32)
    out, b2 = aa._translate(img, boxes, 5.0, -3.0)
    assert np.allclose(b2[0], [7, 15, 27, 35])


def test_autoaugment_policy_runs():
    from mladversarialobjectdetection_tpu.data import autoaugment as aa
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (96, 96, 3), np.uint8)
    boxes = np.array([[20, 20, 60, 50]], np.float32)
    for _ in range(10):
        out, b2 = aa.distort_image_with_autoaugment(rng, img, boxes, "v0")
        assert out.shape == img.shape
        assert b2.shape == (1, 4)
