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


def test_autoaugment_pixel_ops():
    from mladversarialobjectdetection_tpu.data import autoaugment as aa
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    boxes = np.array([[10, 10, 40, 30]], np.float32)
    for name in ("AutoContrast", "Equalize", "Color", "Contrast",
                 "Brightness", "Sharpness", "Solarize", "SolarizeAdd",
                 "Posterize", "Cutout", "BBox_Cutout"):
        out, b2 = aa._apply_op(rng, img, boxes, name, 6.0, 1.0)
        assert out.shape == img.shape and out.dtype == np.uint8
        assert np.allclose(b2, boxes)  # pixel ops never move boxes


def test_autoaugment_geometric_ops_move_boxes_consistently():
    from mladversarialobjectdetection_tpu.data import autoaugment as aa
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    boxes = np.array([[10, 10, 40, 30]], np.float32)
    for name in ("TranslateX_BBox", "TranslateY_BBox", "ShearX_BBox",
                 "ShearY_BBox", "Rotate_BBox"):
        out, b2 = aa._apply_op(rng, img, boxes, name, 6.0, 1.0)
        assert out.shape == img.shape
        assert b2.shape == boxes.shape
        assert (b2[:, 2] >= b2[:, 0]).all() and (b2[:, 3] >= b2[:, 1]).all()
        assert b2.min() >= 0 and b2[:, 0::2].max() <= 64


def test_autoaugment_bbox_only_ops_never_move_boxes():
    """*_Only_BBoxes transforms only the pixel content inside boxes
    (autoaugment.py:486-1060): boxes unchanged, pixels outside untouched."""
    from mladversarialobjectdetection_tpu.data import autoaugment as aa
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    boxes = np.array([[10., 10., 40., 30.], [45., 40., 60., 60.]], np.float32)
    for name in ("Flip_Only_BBoxes", "Equalize_Only_BBoxes",
                 "Solarize_Only_BBoxes", "Cutout_Only_BBoxes",
                 "Rotate_Only_BBoxes", "ShearX_Only_BBoxes",
                 "ShearY_Only_BBoxes", "TranslateX_Only_BBoxes",
                 "TranslateY_Only_BBoxes"):
        # prob=3.0 -> per-box prob 1.0 after the reference's /3 scaling
        out, b2 = aa._apply_op(rng, img, boxes, name, 8.0, 3.0)
        assert np.allclose(b2, boxes), name
        outside = np.ones((64, 64), bool)
        for b in boxes.astype(int):
            outside[b[0]:b[2] + 1, b[1]:b[3] + 1] = False
        assert np.array_equal(out[outside], img[outside]), name


def test_autoaugment_flip_only_bboxes_exact():
    from mladversarialobjectdetection_tpu.data import autoaugment as aa
    rng = np.random.default_rng(3)
    img = np.arange(64 * 64 * 3, dtype=np.uint8).reshape(64, 64, 3)
    boxes = np.array([[8., 8., 20., 24.]], np.float32)
    out, _ = aa._apply_op(rng, img, boxes, "Flip_Only_BBoxes", 10.0, 3.0)
    region = img[8:21, 8:25]
    assert np.array_equal(out[8:21, 8:25], region[:, ::-1])


def test_autoaugment_translate_moves_boxes():
    from mladversarialobjectdetection_tpu.data import autoaugment as aa
    img = np.zeros((64, 64, 3), np.uint8)
    boxes = np.array([[10, 10, 30, 30]], np.float32)
    out, b2 = aa._translate(img, boxes, 5.0, -3.0)
    assert np.allclose(b2[0], [7, 15, 27, 35])


def test_autoaugment_all_policies_run():
    from mladversarialobjectdetection_tpu.data import autoaugment as aa
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (96, 96, 3), np.uint8)
    boxes = np.array([[20, 20, 60, 50]], np.float32)
    for policy in ("v0", "v1", "v2", "v3", "test"):
        for _ in range(8):
            out, b2 = aa.distort_image_with_autoaugment(rng, img, boxes,
                                                        policy)
            assert out.shape == img.shape and out.dtype == np.uint8
            assert b2.shape == (1, 4)
            assert (b2[:, 2] >= b2[:, 0]).all() and (b2[:, 3] >= b2[:, 1]).all()


def test_randaugment_runs():
    from mladversarialobjectdetection_tpu.data import autoaugment as aa
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (96, 96, 3), np.uint8)
    boxes = np.array([[20, 20, 60, 50]], np.float32)
    for _ in range(16):
        out, b2 = aa.distort_image_with_randaugment(rng, img, boxes,
                                                    num_layers=1,
                                                    magnitude=15)
        assert out.shape == img.shape and out.dtype == np.uint8
        assert b2.shape == (1, 4)


def test_equalize_matches_pil_semantics():
    """The step-LUT equalize (PIL point-op, autoaugment.py:1132-1168), not
    cv2.equalizeHist: a flat histogram stays (nearly) unchanged."""
    from mladversarialobjectdetection_tpu.data import autoaugment as aa
    ramp = np.tile(np.arange(256, dtype=np.uint8), (4, 1))
    img = np.stack([ramp] * 3, axis=-1)
    out = aa.equalize(img)
    # uniform histogram: equalize is ~identity (within LUT rounding)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_pascal_convert_roundtrip(tmp_path):
    """Synthesize a VOC2007 layout, convert, read back through the
    training reader (reference create_pascal_tfrecord semantics)."""
    from PIL import Image
    from mladversarialobjectdetection_tpu.data import create_pascal_tfrecord
    from mladversarialobjectdetection_tpu.data.tfrecord import (
        DetectionTFRecordReader)

    root = tmp_path / "VOCdevkit"
    ann_dir = root / "VOC2007" / "Annotations"
    img_dir = root / "VOC2007" / "JPEGImages"
    ann_dir.mkdir(parents=True)
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i, diff in enumerate([0, 1]):
        img = rng.integers(0, 255, (60, 80, 3), np.uint8)
        Image.fromarray(img).save(img_dir / f"im{i}.jpg")
        (ann_dir / f"im{i}.xml").write_text(f"""
<annotation>
  <filename>im{i}.jpg</filename>
  <size><width>80</width><height>60</height><depth>3</depth></size>
  <object>
    <name>person</name><difficult>{diff}</difficult><truncated>0</truncated>
    <bndbox><xmin>8</xmin><ymin>6</ymin><xmax>48</xmax><ymax>36</ymax></bndbox>
  </object>
  <object>
    <name>dog</name><difficult>0</difficult><truncated>1</truncated>
    <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>30</xmax><ymax>50</ymax></bndbox>
  </object>
</annotation>""")
    out = str(tmp_path / "voc")
    n = create_pascal_tfrecord.convert(str(root), out, split="train",
                                       num_shards=2)
    assert n == 2
    reader = DetectionTFRecordReader(out + "*.tfrecord", image_size=64,
                                     mean_rgb=127.0, stddev_rgb=128.0,
                                     skip_crowd=False, shuffle=False)
    batch = next(reader.batches(2))
    assert batch["images"].shape == (2, 64, 64, 3)
    assert batch["valid"][:, :2].all()
    # person=15 -> 0-based 14; dog=12 -> 11
    assert sorted(batch["classes"][0, :2].tolist()) == [11, 14]
    # difficult skipping drops the person in image 1 when requested
    n2 = create_pascal_tfrecord.convert(
        str(root), str(tmp_path / "voc2"), split="train", num_shards=1,
        ignore_difficult_instances=True)
    assert n2 == 2
    reader2 = DetectionTFRecordReader(str(tmp_path / "voc2") + "*.tfrecord",
                                      image_size=64, mean_rgb=127.0,
                                      stddev_rgb=128.0, skip_crowd=False,
                                      shuffle=False)
    b2 = next(reader2.batches(2))
    assert int(b2["valid"][1].sum()) == 1  # only the dog survives


def test_inspect_tfrecords(tmp_path):
    from mladversarialobjectdetection_tpu.data import inspect_tfrecords
    from mladversarialobjectdetection_tpu.data.tfrecord import (
        write_fake_tfrecord)
    path = str(tmp_path / "fake.tfrecord")
    write_fake_tfrecord(path, n=4, image_hw=(48, 48))
    stats = inspect_tfrecords.summarize(path)
    assert stats["examples"] == 4
    assert stats["boxes"] >= 4
    assert stats["min_hw"] == (48, 48)
    n = inspect_tfrecords.save_samples(path, str(tmp_path / "samples"),
                                       samples=2)
    assert n == 2
    import os
    assert len(os.listdir(tmp_path / "samples")) == 2
