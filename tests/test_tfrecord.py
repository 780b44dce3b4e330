import os

import numpy as np
import pytest

from udal_tpu.data import example_codec as codec
from udal_tpu.data import tfrecord as tfr


def test_native_lib_builds():
    assert tfr._load_lib() is not None, "native libtfrecord_io.so must build"


def test_roundtrip_records(tmp_path):
    path = str(tmp_path / "a.tfrecord")
    records = [b"hello", b"", b"x" * 10000, bytes(range(256))]
    with tfr.TFRecordWriter(path) as w:
        for r in records:
            w.write(r)
    got = list(tfr.iterate_tfrecord(path))
    assert got == records
    offs, lens = tfr.scan_tfrecord(path, verify_crc=True)
    assert len(offs) == len(records)
    assert tfr.read_record(path, offs[2], lens[2]) == records[2]


def test_index_multiple_shards(tmp_path):
    paths = []
    for s in range(3):
        p = str(tmp_path / f"s{s}.tfrecord")
        with tfr.TFRecordWriter(p) as w:
            for i in range(4):
                w.write(f"shard{s}-rec{i}".encode())
        paths.append(p)
    idx = tfr.TFRecordIndex(paths)
    assert len(idx) == 12
    assert idx[5] == b"shard1-rec1"


def test_crc32c_known_values():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8A9136AA
    assert tfr.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert tfr.crc32c(b"123456789") == 0xE3069283


def test_tfrecord_readable_by_tensorflow(tmp_path):
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "tf.tfrecord")
    with tfr.TFRecordWriter(path) as w:
        w.write(b"payload-1")
        w.write(b"payload-2")
    ds = list(tf.data.TFRecordDataset(path).as_numpy_iterator())
    assert ds == [b"payload-1", b"payload-2"]


def test_example_codec_roundtrip():
    feats = {
        "image/encoded": codec.bytes_feature(b"\x89PNG fake"),
        "image/height": codec.int64_feature(375),
        "image/width": codec.int64_feature(1242),
        "image/object/bbox/xmin": codec.float_list_feature([0.1, 0.5]),
        "image/object/class/label": codec.int64_list_feature([1, 3]),
        "image/object/class/text": codec.bytes_list_feature(["car", "cyclist"]),
    }
    record = codec.serialize_example(feats)
    parsed = codec.parse_example(record)
    assert parsed["image/encoded"] == [b"\x89PNG fake"]
    assert parsed["image/height"] == [375]
    np.testing.assert_allclose(parsed["image/object/bbox/xmin"], [0.1, 0.5],
                               rtol=1e-6)
    assert parsed["image/object/class/label"] == [1, 3]
    assert parsed["image/object/class/text"] == [b"car", b"cyclist"]


def test_example_codec_parses_tensorflow_example():
    tf = pytest.importorskip("tensorflow")
    ex = tf.train.Example(features=tf.train.Features(feature={
        "image/height": tf.train.Feature(
            int64_list=tf.train.Int64List(value=[375])),
        "image/object/bbox/xmin": tf.train.Feature(
            float_list=tf.train.FloatList(value=[0.25, 0.75])),
        "image/encoded": tf.train.Feature(
            bytes_list=tf.train.BytesList(value=[b"imgdata"])),
    }))
    parsed = codec.parse_example(ex.SerializeToString())
    assert parsed["image/height"] == [375]
    np.testing.assert_allclose(parsed["image/object/bbox/xmin"], [0.25, 0.75])
    assert parsed["image/encoded"] == [b"imgdata"]


def test_tensorflow_parses_our_example():
    tf = pytest.importorskip("tensorflow")
    record = codec.serialize_example({
        "image/height": codec.int64_feature(100),
        "image/object/bbox/ymin": codec.float_list_feature([0.5]),
        "image/source_id": codec.bytes_feature("42"),
    })
    ex = tf.train.Example.FromString(record)
    f = ex.features.feature
    assert f["image/height"].int64_list.value[0] == 100
    assert abs(f["image/object/bbox/ymin"].float_list.value[0] - 0.5) < 1e-6
    assert f["image/source_id"].bytes_list.value[0] == b"42"
