"""Multimodal plumbing tests: binary payload + typed meta schema, Arrow
decode stage, frame-sampling fan-out, media embedding."""

from __future__ import annotations

import pytest

from food_panda_etl_spark.functions import (
    attach_payload_meta,
    decode_images,
    embed_media,
    sample_frames,
    synth_image_payload,
)
from food_panda_etl_spark.functions.multimodal import _decode_payload


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, "image", bytearray(synth_image_payload(4, 3, seed=1))),
        (2, "image", bytearray(synth_image_payload(8, 2, seed=2))),
        (3, "image", bytearray(synth_image_payload(2, 2, seed=3))),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, kind string, payload binary")
    return attach_payload_meta(df)


def test_meta_schema_and_values(media_df):
    assert media_df.schema["payload"].dataType.typeName() == "binary"
    meta_fields = {f.name: f.dataType.typeName() for f in media_df.schema["meta"].dataType.fields}
    assert meta_fields == {
        "format": "string", "width": "integer", "height": "integer",
        "n_bytes": "long", "content_id": "string",
    }
    r = {x["media_id"]: x for x in media_df.select("media_id", "meta.n_bytes").collect()}
    # header + w*h pixel bytes
    assert r[1]["n_bytes"] == len(synth_image_payload(4, 3, seed=1))


def test_decode_stage(media_df):
    got = {r["media_id"]: r for r in decode_images(media_df).collect()}
    assert (got[1]["width"], got[1]["height"]) == (4, 3)
    assert (got[2]["width"], got[2]["height"]) == (8, 2)
    # deterministic fake pixels → deterministic mean
    _w, _h, px = _decode_payload(synth_image_payload(4, 3, seed=1))
    assert got[1]["mean_pixel"] == pytest.approx(sum(px) / len(px))
    assert len(got[1]["content_id"]) == 16


def test_decode_rejects_unknown_format(spark):
    df = attach_payload_meta(
        spark.createDataFrame(
            [(9, "image", bytearray(b"\xff\xd8notreallyjpeg"))],
            "media_id bigint, kind string, payload binary",
        )
    )
    with pytest.raises(Exception, match="NotImplementedError|real image codecs"):
        decode_images(df).collect()


def test_frame_sampling_fan_out(media_df):
    frames = sample_frames(media_df, every_n=2).collect()
    by_id: dict[int, list] = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    # heights 3,2,2 sampled every 2 rows → 2,1,1 frames
    assert {k: len(v) for k, v in by_id.items()} == {1: 2, 2: 1, 3: 1}
    f = sorted(by_id[1], key=lambda r: r["frame_no"])
    assert [r["frame_no"] for r in f] == [0, 2]
    assert len(bytes(f[0]["frame"])) == 4  # one w-wide pixel row


def test_embed_media_normalized(media_df):
    vecs = {r["media_id"]: r["embedding"] for r in embed_media(media_df).collect()}
    assert all(len(v) == 8 for v in vecs.values())
    for v in vecs.values():
        assert sum(x * x for x in v) == pytest.approx(1.0, abs=1e-5)
    # deterministic across runs
    again = {r["media_id"]: r["embedding"] for r in embed_media(media_df).collect()}
    assert vecs == again


def test_audio_features_real_dsp(spark):
    """Raw-PCM decode + FFT features are REAL (numpy DSP, no codec stub):
    a 440 Hz sine must report dominant frequency within one FFT bin,
    RMS ~= amplitude/sqrt(2), and ZCR ~= 2*f/rate; a 1760 Hz tone must
    rank higher on every spectral measure."""
    from food_panda_etl_spark.functions.multimodal import (
        audio_features,
        synth_audio_payload,
    )

    rate, n = 16_000, 4096
    rows = [
        (1, synth_audio_payload(440.0, n, rate=rate, amplitude=0.5, seed=1)),
        (2, synth_audio_payload(1760.0, n, rate=rate, amplitude=0.5, seed=2)),
        (3, b""),  # empty payload must not kill the job
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in audio_features(df, rate=rate).collect()}

    bin_hz = rate / n
    a, b = got[1], got[2]
    assert abs(a["dominant_freq_hz"] - 440.0) <= bin_hz
    assert abs(b["dominant_freq_hz"] - 1760.0) <= bin_hz
    assert abs(a["rms"] - 0.5 / 2**0.5) < 0.01
    assert abs(a["zero_crossing_rate"] - 2 * 440.0 / rate) < 0.01
    assert b["spectral_centroid_hz"] > a["spectral_centroid_hz"]
    assert got[3]["n_samples"] == 0 and got[3]["rms"] == 0.0
