"""TFRecord reader tests (InputReader parity patterns,
reference dataloader_test.py:29 + test_util.py:22-65)."""
import os

import numpy as np
import pytest

import mladversarialobjectdetection_tpu as mad
from mladversarialobjectdetection_tpu.data import tfrecord


def test_fake_tfrecord_roundtrip(tmp_path):
    path = str(tmp_path / "fake.tfrecord")
    tfrecord.write_fake_tfrecord(path, n=3)
    records = list(tfrecord.read_tfrecord_file(path))
    assert len(records) == 3
    ex = tfrecord.parse_example(records[0])
    assert "image/encoded" in ex
    dec = tfrecord.decode_detection_example(ex)
    assert dec["image"].shape == (64, 64, 3)
    assert dec["boxes"].shape == (1, 4)
    assert np.allclose(dec["boxes"][0], [0.1, 0.1, 0.6, 0.5], atol=1e-6)
    assert dec["classes"][0] == 1


def test_reader_batches(tmp_path):
    path = str(tmp_path / "fake.tfrecord")
    tfrecord.write_fake_tfrecord(path, n=4)
    reader = tfrecord.DetectionTFRecordReader(
        path, image_size=64, mean_rgb=127.0, stddev_rgb=128.0,
        max_instances=8, shuffle=False)
    batch = next(reader.batches(2))
    assert batch["images"].shape == (2, 64, 64, 3)
    assert batch["boxes"].shape == (2, 8, 4)
    assert batch["classes"].shape == (2, 8)
    assert batch["valid"][:, 0].all() and not batch["valid"][:, 1].any()
    # normalized 0.1..0.6 box on a 64px image scaled 1.0
    assert np.allclose(batch["boxes"][0, 0], [6.4, 6.4, 38.4, 32.0],
                       atol=1e-3)
    assert batch["classes"][0, 0] == 0  # 1-based label -> 0-based model id
    # fake records carry is_crowd=0: flagged in the batch, none crowd
    assert batch["is_crowd"].shape == (2, 8)
    assert not batch["is_crowd"].any()


@pytest.mark.slow
def test_parse_real_tf_example(tmp_path):
    """Cross-check the wire-format parser against TensorFlow's own
    serializer when TF is available."""
    tf = pytest.importorskip("tensorflow")
    ex = tf.train.Example(features=tf.train.Features(feature={
        "image/object/bbox/ymin": tf.train.Feature(
            float_list=tf.train.FloatList(value=[0.25, 0.5])),
        "image/object/class/label": tf.train.Feature(
            int64_list=tf.train.Int64List(value=[7, 300])),
        "name": tf.train.Feature(
            bytes_list=tf.train.BytesList(value=[b"hello"])),
    }))
    parsed = tfrecord.parse_example(ex.SerializeToString())
    assert np.allclose(parsed["image/object/bbox/ymin"], [0.25, 0.5])
    assert parsed["image/object/class/label"] == [7, 300]
    assert parsed["name"] == [b"hello"]


def test_frame_record_crc_check_value():
    from mladversarialobjectdetection_tpu.data import tfrecord as tfr
    # CRC32C("123456789") = 0xE3069283 (the standard check value)
    assert tfr._crc32c_py(b"123456789") == 0xE3069283
    if tfr._tfrecord_native is not None:
        assert tfr._tfrecord_native.crc32c(b"123456789") == 0xE3069283
    # masked crc matches between implementations by construction
    frame = tfr.frame_record(b"payload")
    assert len(frame) == 8 + 4 + 7 + 4


def test_native_reader_roundtrip_and_corruption(tmp_path):
    import pytest as _pytest
    from mladversarialobjectdetection_tpu.data import tfrecord as tfr
    if tfr._tfrecord_native is None:
        _pytest.skip("native extension not built (tools/build_native.sh)")
    path = str(tmp_path / "x.tfrecord")
    payloads = [b"a" * 10, b"hello world", b"z" * 1000]
    with open(path, "wb") as f:
        for p in payloads:
            f.write(tfr.frame_record(p))
    assert tfr._tfrecord_native.read_records(path) == payloads
    assert list(tfr.read_tfrecord_file(path)) == payloads
    # corrupt one payload byte -> CRC failure raised, not garbage returned
    blob = bytearray(open(path, "rb").read())
    blob[8 + 4 + 2] ^= 0xFF
    bad = str(tmp_path / "bad.tfrecord")
    open(bad, "wb").write(bytes(blob))
    with _pytest.raises(ValueError, match="CRC"):
        tfr._tfrecord_native.read_records(bad)
    # unverified read still works (opt-out)
    assert len(tfr._tfrecord_native.read_records(bad, verify_crc=False)) == 3


@pytest.mark.slow
def test_tf_reads_our_tfrecords(tmp_path):
    """Interop: TF's own (CRC-verifying) reader consumes our output —
    zero-CRC frames would be rejected by tf.data."""
    tf = pytest.importorskip("tensorflow")
    from mladversarialobjectdetection_tpu.data.tfrecord import (
        write_fake_tfrecord)
    path = str(tmp_path / "ours.tfrecord")
    write_fake_tfrecord(path, n=3, image_hw=(32, 32))
    recs = list(tf.data.TFRecordDataset([path]))
    assert len(recs) == 3
    ex = tf.train.Example()
    ex.ParseFromString(recs[0].numpy())
    keys = set(ex.features.feature.keys())
    assert "image/encoded" in keys and "image/object/bbox/ymin" in keys
