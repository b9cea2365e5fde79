"""The video-decode boundary (operators/multimodal.py — VERDICT r5
item 7): both sides of the pyav gate are pinned, and the m3 decode
plumbing (schema, per-asset batch shape, offset arithmetic) is
exercised with an injected deterministic decoder, so the deploy-time
stub is test-visible instead of a bare NotImplementedError."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from pokemon_showdown_airflow_etl_spark.operators import multimodal as mm


def _assets(spark):
    rows = [
        ("vid0", b"fake-container-bytes-0", 2500),
        ("vid1", b"fake-container-bytes-1", 1000),
        ("vid2", b"x", 0),  # zero duration still yields frame 0
        ("vid3", b"y", None),  # null duration -> frame 0, like the plan twin
    ]
    return spark.createDataFrame(
        rows, "asset_id string, payload binary, duration_ms long"
    )


def test_sample_video_frames_plumbing_with_injected_decoder(spark):
    # defined INSIDE the test: cloudpickle ships closures by value, but
    # a test-module-level function would be pickled by reference and
    # executors can't import the tests package
    def _fake_decoder(payload: bytes, frame_ms: int):
        h = hashlib.md5(payload + str(frame_ms).encode()).hexdigest()
        return (320, 240, h)

    df = _assets(spark)
    out = mm.sample_video_frames(df, every_n_ms=1000, decoder=_fake_decoder)
    rows = {(r["asset_id"], r["frame_ms"]): r for r in out.collect()}
    # offsets match the JVM-side planning twin exactly
    plan = {
        (r["asset_id"], r["frame_ms"])
        for r in mm.frame_sample_plan(df, every_n_ms=1000).collect()
    }
    assert set(rows) == plan
    assert set(rows) == {
        ("vid0", 0), ("vid0", 1000), ("vid0", 2000),
        ("vid1", 0), ("vid2", 0), ("vid3", 0),
    }
    r = rows[("vid0", 1000)]
    assert (r["width"], r["height"]) == (320, 240)
    assert r["frame_md5"] == _fake_decoder(b"fake-container-bytes-0", 1000)[2]


@pytest.mark.skipif(mm.HAS_PYAV, reason="pyav installed: boundary is open")
def test_decode_video_frame_raises_without_pyav():
    with pytest.raises(NotImplementedError, match="pyav/ffmpeg"):
        mm.decode_video_frame(b"anything", 0)


@pytest.mark.skipif(not mm.HAS_PYAV, reason="pyav not installed here")
def test_decode_video_frame_real_roundtrip(spark):  # pragma: no cover
    """Deploy-side: encode a tiny synthetic video with pyav, decode a
    sampled frame through the full operator."""
    import io

    import av
    import numpy as np

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=10)
        stream.width, stream.height = 64, 48
        stream.pix_fmt = "yuv420p"
        for i in range(20):
            arr = np.full((48, 64, 3), i * 12, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    payload = buf.getvalue()

    df = spark.createDataFrame(
        [("v", payload, 2000)], "asset_id string, payload binary, duration_ms long"
    )
    out = mm.sample_video_frames(df, every_n_ms=1000).collect()
    assert {r["frame_ms"] for r in out} == {0, 1000}
    assert all(r["width"] == 64 and r["height"] == 48 for r in out)
