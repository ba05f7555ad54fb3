"""Input-pipeline tests (train_data_generator.py semantics)."""
import os

import jax
import numpy as np
import pytest

import mladversarialobjectdetection_tpu as mad
from mladversarialobjectdetection_tpu.data import pipeline


@pytest.fixture()
def image_dir(tmp_path):
    from PIL import Image
    img_dir = tmp_path / "imgs"
    label_dir = tmp_path / "labels"
    img_dir.mkdir(); label_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        arr = (rng.uniform(0, 255, (100, 80, 3))).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"img{i}.png")
        # boxes: first three safe, others violate the border/area rules
        if i < 3:
            lines = ["0 30 30 60 50\n"]
        elif i < 5:
            lines = ["0 5 30 60 50\n"]          # ymin < 20 margin
        else:
            lines = ["0 25 25 75 75\n"]          # area ratio >= .1
        (label_dir / f"img{i}.txt").write_text("".join(lines))
    return str(img_dir), str(label_dir)


def test_source_shapes(image_dir):
    img_dir, _ = image_dir
    src = pipeline.ImageFolderSource(img_dir, 64, 127.0, 128.0, shuffle=False)
    x = src[0]
    assert x.shape == (64, 64, 3)
    # normalized to ~[-1, 1] with zero padding at the bottom/right
    assert x.min() >= -1.0 and x.max() <= 1.0
    # aspect 100x80 -> scale .64 -> 64x51 content, rest zero pad
    assert np.allclose(x[:, 52:, :], 0.0)
    batches = list(src.batches(4))
    assert batches[0].shape == (4, 64, 64, 3)
    assert len(batches) == 2  # 6 imgs -> 2 batches (last padded by wrap)
    assert batches[1].shape == (4, 64, 64, 3)


def test_filter_by_dims(image_dir):
    img_dir, label_dir = image_dir
    kept = [f for f in sorted(os.listdir(img_dir))
            if pipeline.filter_by_dims(img_dir, label_dir, 0.1, f)]
    assert kept == ["img0.png", "img1.png", "img2.png"]


def test_partition(image_dir):
    img_dir, label_dir = image_dir
    cfg = mad.get_efficientdet_config("efficientdet-lite0")
    cfg.image_size = 64
    parts = pipeline.partition(cfg, img_dir, label_dir, batch_size=2,
                               filter_data=True)
    assert len(parts["train"]["source"]) == 2  # 3 kept * .9 -> 2
    assert len(parts["val"]["source"]) == 1


def test_augment_batch_bounds():
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (4, 32, 32, 3), minval=-1, maxval=1)
    out = pipeline.augment_batch(key, imgs)
    assert out.shape == imgs.shape
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0


def test_prefetch_order():
    it = pipeline.prefetch(iter([1, 2, 3]))
    assert list(it) == [1, 2, 3]


def test_synthetic_batches():
    it = pipeline.synthetic_batches(2, 32)
    b = next(it)
    assert b.shape == (2, 32, 32, 3)
    assert b.dtype == np.float32


def test_empty_source_raises_instead_of_hanging(tmp_path):
    """repeat_batches on an empty source (tiny dataset -> 0-file train
    split, or everything filtered out) raises immediately instead of
    busy-looping forever behind the prefetch queue."""
    d = tmp_path / "empty"
    d.mkdir()
    src = pipeline.ImageFolderSource(str(d), 64, 127.0, 128.0)
    with pytest.raises(ValueError, match="no images"):
        next(src.repeat_batches(2))


def test_label_parser_tolerates_blank_and_malformed_lines(image_dir):
    """Trailing blank lines / malformed rows in label files are skipped,
    not fatal to the whole filter pass."""
    img_dir, label_dir = image_dir
    with open(os.path.join(label_dir, "img0.txt"), "a") as f:
        f.write("\n   \nnot a number line\n0 1 2\n")
    kept = [f for f in sorted(os.listdir(img_dir))
            if pipeline.filter_by_dims(img_dir, label_dir, 0.1, f)]
    assert kept == ["img0.png", "img1.png", "img2.png"]


def test_stream_bad_path_is_nonfatal():
    """A mistyped/deleted video path yields an unopened capture: play()
    logs an error and produces no frames (no AttributeError on cap=None)."""
    from mladversarialobjectdetection_tpu.inference.streaming import Stream
    s = Stream("/definitely/not/here.mp4")
    assert s.cap is not None and s.files is None
    assert list(s.play()) == []
