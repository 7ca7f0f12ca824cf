"""Multimodal binary plumbing: metadata sniff, feature extraction via
mapInPandas (stub decoder), deterministic frame sampling."""

import pytest
from pyspark.sql import functions as F

from easyner_spark.ops.multimodal import image_features, payload_meta, sample_frames

PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64
JPG = b"\xff\xd8\xff\xe0" + b"\x01" * 100
MP4 = b"\x00\x00\x00\x18ftypisom" + b"\x02" * 500
RAW = b"justbytes" * 50


@pytest.fixture()
def payloads(spark):
    return spark.createDataFrame(
        [("p1", PNG), ("p2", JPG), ("p3", MP4), ("p4", RAW)],
        "payload_id string, payload binary",
    )


def test_payload_meta_sniff(spark, payloads):
    rows = {r["payload_id"]: r for r in payload_meta(payloads).collect()}
    assert rows["p1"]["format"] == "png"
    assert rows["p2"]["format"] == "jpeg"
    assert rows["p3"]["format"] == "mp4"
    assert rows["p4"]["format"] == "unknown"
    assert rows["p1"]["n_bytes"] == len(PNG)
    assert len(rows["p1"]["payload_md5"]) == 32


def test_image_features_stub_deterministic(spark, payloads):
    a = {r["payload_id"]: r for r in image_features(payloads).collect()}
    b = {r["payload_id"]: r for r in image_features(payloads.repartition(4)).collect()}
    assert set(a) == {"p1", "p2", "p3", "p4"}
    for k in a:
        assert len(a[k]["features"]) == 64
        assert a[k]["features"] == b[k]["features"]  # partition-invariant
        assert a[k]["width"] >= 1 and a[k]["height"] >= 1


def test_sample_frames_shape(spark, payloads):
    frames = sample_frames(payloads, n_frames=4, frame_size=64).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["payload_id"], []).append(r)
    assert all(len(v) == 4 for v in by_id.values())
    # first frame starts at byte 0; frames are within the payload
    p3 = sorted(by_id["p3"], key=lambda r: r["frame_idx"])
    assert bytes(p3[0]["frame_bytes"])[:8] == MP4[:8]
    assert all(len(bytes(r["frame_bytes"])) <= 64 for r in p3)
    # last frame reaches the payload tail
    assert bytes(p3[-1]["frame_bytes"]) == MP4[-64:]
