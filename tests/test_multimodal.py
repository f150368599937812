"""Multimodal plumbing: actor-pool decode/resize/frame-sample over binary
columns (decode kernel stubbed by a deterministic fake format)."""

import importlib.util

import pyarrow as pa
import pytest
import ray.data

from recursive_pdf_extraction_and_rag_ray.stages.multimodal import (
    DecodeAudioFeatures,
    DecodeImageFeatures,
    ResizeImage,
    SampleVideoFrames,
    make_fake_audio,
    make_fake_image,
    parse_fake_image,
)


def _media_table(n=8):
    rows = []
    for i in range(n):
        rows.append({
            "media_id": i,
            "kind": "image",
            "payload": make_fake_image(i, 32 + i * 8, 24 + i * 4),
            "meta": {"source": f"s{i}", "codec": "rpximg1"},
        })
    return pa.Table.from_pylist(rows)


def test_decode_features_actor_pool():
    ds = ray.data.from_arrow(_media_table())
    out = ds.map_batches(DecodeImageFeatures, batch_format="pyarrow",
                         batch_size=4, concurrency=(1, 2)).to_pandas()
    assert len(out) == 8
    assert (out["width"] == [32 + i * 8 for i in range(8)]).all()
    assert out["histogram"].map(len).eq(16).all()
    # deterministic: re-run gives identical features
    out2 = ray.data.from_arrow(_media_table()).map_batches(
        DecodeImageFeatures, batch_format="pyarrow",
        concurrency=(1, 2)).to_pandas()
    assert (out.sort_values("media_id")["mean_intensity"].to_numpy()
            == out2.sort_values("media_id")["mean_intensity"].to_numpy()).all()


def test_decode_audio_features_actor_pool():
    rows = [{"media_id": i, "kind": "audio",
             "payload": make_fake_audio(i, 16000 * (1 + i)),
             "meta": {"source": f"a{i}", "codec": "rpxaud1"}}
            for i in range(4)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = ds.map_batches(DecodeAudioFeatures, batch_format="pyarrow",
                         batch_size=2, concurrency=(1, 2)).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert out["duration_s"].tolist() == [1.0, 2.0, 3.0, 4.0]
    assert (out["rms"] > 0).all()
    assert ((out["zero_crossing_rate"] >= 0)
            & (out["zero_crossing_rate"] <= 1)).all()


def test_resize_roundtrip():
    ds = ray.data.from_arrow(_media_table(4))
    out = ds.map_batches(ResizeImage, batch_format="pyarrow",
                         fn_constructor_kwargs={"target": 16},
                         concurrency=(1, 2)).to_pandas()
    for p in out["payload"]:
        w, h, c, pix = parse_fake_image(p)
        assert (w, h) == (16, 16) and pix.shape == (16, 16, 3)


def test_video_frame_sampling_flatmap():
    video = b"".join(make_fake_image(i, 16, 16) for i in range(25))
    t = pa.Table.from_pylist([{"media_id": 7, "kind": "video",
                               "payload": video,
                               "meta": {"source": "v", "codec": "concat"}}])
    out = ray.data.from_arrow(t).map_batches(
        SampleVideoFrames, batch_format="pyarrow",
        fn_constructor_kwargs={"every": 10}, concurrency=(1, 2)).to_pandas()
    assert list(out["frame_no"]) == [0, 10, 20]
    assert (out["media_id"] == 7).all()


def _minimal_png(width=4, height=3, value=200):
    """Hand-built valid 8-bit grayscale PNG (no imaging library needed to
    construct it): signature + IHDR + IDAT(zlib, filter 0 rows) + IEND."""
    import struct
    import zlib

    def chunk(tag, data):
        body = tag + data
        return struct.pack(">I", len(data)) + body \
            + struct.pack(">I", zlib.crc32(body))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes([value]) * width for _ in range(height))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


@pytest.mark.skipif(importlib.util.find_spec("PIL") is None,
                    reason="PIL not installed — the real-decode branch of "
                           "DecodeImageFeatures is exercised wherever it is")
def test_decode_real_png_with_pil(ray_session):
    """Non-stub branch of DecodeImageFeatures._decode: a real PNG byte
    string decodes through PIL with correct dimensions and intensity."""
    png = _minimal_png(width=4, height=3, value=200)
    media = ray.data.from_arrow(pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([png], pa.large_binary()),
    }))
    out = media.map_batches(DecodeImageFeatures, batch_format="pyarrow",
                            batch_size=8, concurrency=1).to_pandas()
    assert int(out.loc[0, "width"]) == 4
    assert int(out.loc[0, "height"]) == 3
    assert abs(out.loc[0, "mean_intensity"] - 200.0) < 1e-6


def test_decode_real_payload_without_pil_raises():
    """Without PIL a non-RPXIMG1 payload must fail loudly (documented
    NotImplementedError), never silently produce fake features."""
    if importlib.util.find_spec("PIL") is not None:
        pytest.skip("PIL installed — stub branch unreachable")
    dec = DecodeImageFeatures()
    with pytest.raises(NotImplementedError):
        dec._decode(_minimal_png())
