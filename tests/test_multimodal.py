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
    # a magic no built-in codec claims (JPEG now decodes for real, so
    # \xff\xd8 dispatches to _decode_jpeg instead of hitting this seam)
    df = attach_payload_meta(
        spark.createDataFrame(
            [(9, "image", bytearray(b"RIFFwebpnotsupported"))],
            "media_id bigint, kind string, payload binary",
        )
    )
    with pytest.raises(Exception, match="NotImplementedError|no codec"):
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


def test_bmp_decode_exact_pixels_hand_built():
    """A 2x2 24-bit BMP constructed byte-by-byte (not via our own writer —
    no circular round-trip): bottom-up BGR rows with 2-byte padding must
    decode to the exact top-down integer-luma grays."""
    # Pixels top-down: (R,G,B) = (10,20,30) (40,50,60) / (70,80,90) (100,110,120)
    row_top = bytes((30, 20, 10)) + bytes((60, 50, 40)) + b"\x00\x00"
    row_bot = bytes((90, 80, 70)) + bytes((120, 110, 100)) + b"\x00\x00"
    body = row_bot + row_top  # bottom-up storage order
    off = 54
    payload = (
        b"BM" + (off + len(body)).to_bytes(4, "little") + b"\x00" * 4
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + (2).to_bytes(4, "little", signed=True)
        + (2).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    ) + body
    w, h, px = _decode_payload(payload)
    assert (w, h) == (2, 2)
    assert list(px) == [20, 50, 80, 110]  # (r+g+b)//3, top-down row-major


def test_bmp_decode_top_down_variant():
    """Negative height means top-down row order — the decoder must NOT
    flip those."""
    from food_panda_etl_spark.functions.multimodal import synth_bmp_payload

    bottom_up = bytearray(synth_bmp_payload(3, 2, seed=5))
    w, h, px_ref = _decode_payload(bytes(bottom_up))
    # Flip to top-down: negate height, reverse the stored row order
    stride = (3 * 3 + 3) & ~3
    rows = [bytes(bottom_up[54 + i * stride : 54 + (i + 1) * stride]) for i in range(2)]
    top_down = bytes(bottom_up[:22]) + (-2).to_bytes(4, "little", signed=True) \
        + bytes(bottom_up[26:54]) + b"".join(reversed(rows))
    w2, h2, px2 = _decode_payload(top_down)
    assert (w2, h2) == (w, h) and px2 == px_ref


def test_ppm_decode_with_comment():
    """P6 PPM with a header comment decodes to integer-luma grays."""
    raster = bytes((10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120))
    payload = b"P6\n# a comment\n2 2\n255\n" + raster
    w, h, px = _decode_payload(payload)
    assert (w, h) == (2, 2)
    assert list(px) == [20, 50, 80, 110]


def test_bmp_roundtrip_through_spark_decode_stage(spark):
    """VERDICT r2 task 3 'done' bar: a synthetic REAL BMP flows through
    the Arrow decode stage — dimensions and a pixel checksum verified —
    alongside fake-format payloads in the same frame (mixed-format
    batches)."""
    from food_panda_etl_spark.functions.multimodal import synth_bmp_payload

    bmp = synth_bmp_payload(16, 9, seed=11)
    rows = [
        (1, "image", bytearray(bmp)),
        (2, "image", bytearray(synth_image_payload(4, 3, seed=1))),
    ]
    df = attach_payload_meta(
        spark.createDataFrame(rows, "media_id bigint, kind string, payload binary")
    )
    got = {r["media_id"]: r for r in decode_images(df).collect()}
    assert (got[1]["width"], got[1]["height"]) == (16, 9)
    w, h, px = _decode_payload(bmp)
    assert got[1]["mean_pixel"] == pytest.approx(sum(px) / len(px))
    assert len(px) == 16 * 9
    # frame sampling over the real BMP: every-2nd pixel row, w bytes each
    frames = sample_frames(df.filter("media_id = 1"), every_n=2).collect()
    assert len(frames) == 5  # ceil(9/2)
    assert all(len(bytes(f["frame"])) == 16 for f in frames)


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


def test_png_decode_matches_bmp_on_same_pixels():
    """PNG and BMP encoders share the channel formula, so both decoders
    must produce identical grayscale — cross-checks chunk layout, zlib
    inflate, and every filter inversion against the independently tested
    BMP path. Heights >= 10 exercise all five scanline filters twice."""
    from food_panda_etl_spark.functions.multimodal import (
        _decode_bmp,
        _decode_png,
        synth_bmp_payload,
        synth_png_payload,
    )

    for w, h, seed, alpha in [(8, 10, 3, False), (9, 11, 7, True), (1, 1, 0, False)]:
        assert _decode_png(synth_png_payload(w, h, seed, alpha)) == _decode_bmp(
            synth_bmp_payload(w, h, seed)
        )


def test_png_decode_rejects_corruption_and_unsupported():
    """A flipped byte must fail the CRC check (never decode garbage);
    16-bit / interlaced headers must hit the explicit unsupported guard."""
    import pytest

    from food_panda_etl_spark.functions.multimodal import (
        _decode_png,
        synth_png_payload,
    )

    payload = bytearray(synth_png_payload(8, 6, seed=3))
    payload[60] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        _decode_png(bytes(payload))

    # patch IHDR bit depth to 16 and re-CRC the chunk: supported-format
    # guard, not the CRC guard, must fire
    import zlib

    good = bytearray(synth_png_payload(8, 6, seed=3))
    ihdr_start = 8 + 8
    ihdr = bytearray(good[ihdr_start : ihdr_start + 13])
    ihdr[8] = 16
    good[ihdr_start : ihdr_start + 13] = ihdr
    crc = zlib.crc32(b"IHDR" + bytes(ihdr)) & 0xFFFFFFFF
    good[ihdr_start + 13 : ihdr_start + 17] = crc.to_bytes(4, "big")
    with pytest.raises(NotImplementedError, match="bit_depth=16"):
        _decode_png(bytes(good))


def test_png_roundtrip_through_spark_decode_stage(spark):
    """The full Arrow pipeline on real PNG bytes: generate → meta →
    decode, RGBA and RGB mixed, exact mean-gray assertions."""
    from food_panda_etl_spark.functions.multimodal import (
        _decode_png,
        attach_payload_meta,
        decode_images,
        synth_png_payload,
    )

    rows = [(i, synth_png_payload(6 + i, 10, seed=i, alpha=bool(i % 2))) for i in range(4)]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = {
        r["media_id"]: r
        for r in decode_images(attach_payload_meta(df, fmt="png")).collect()
    }
    for i, payload in rows:
        w, h, gray = _decode_png(payload)
        assert out[i]["width"] == w and out[i]["height"] == h
        assert out[i]["mean_pixel"] == sum(gray) / len(gray)


def test_jpeg_decode_exact_blocks_both_samplings():
    """Baseline JFIF roundtrip is bit-exact on constant-per-block
    content for 4:4:4 AND 4:2:0, including non-multiple-of-8 (and -16)
    dimensions where edge MCUs are padding-replicated."""
    from food_panda_etl_spark.functions.multimodal import (
        _decode_jpeg,
        synth_jpeg_payload,
    )

    for seed in (0, 1, 7, 20):
        for sub in (False, True):
            w, h = 9 + seed % 16, 9 + seed % 14
            got_w, got_h, gray = _decode_jpeg(
                synth_jpeg_payload(w, h, seed, subsample=sub)
            )
            assert (got_w, got_h) == (w, h)
            bpr = (w + 7) // 8
            want = bytes(
                (seed * 31 + ((y // 8) * bpr + (x // 8)) * 7) % 256
                for y in range(h)
                for x in range(w)
            )
            assert gray == want, (seed, sub)


def test_jpeg_decode_rejects_corruption_and_unsupported():
    import pytest

    from food_panda_etl_spark.functions.multimodal import (
        _decode_jpeg,
        synth_jpeg_payload,
    )

    big = synth_jpeg_payload(64, 64, seed=3)
    with pytest.raises(ValueError, match="truncated"):
        _decode_jpeg(big[:-10])  # cut lands inside the entropy scan
    small = synth_jpeg_payload(16, 16, seed=3)
    prog = bytearray(small)
    prog[small.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF2"):
        _decode_jpeg(bytes(prog))
    with pytest.raises(ValueError, match="not a JPEG"):
        _decode_jpeg(b"\x00\x01rubbish")


def test_mixed_format_batch_through_spark_decode_stage(spark):
    """One decode stage, four REAL formats in the same Arrow batch —
    dispatch is per-row by magic number, and every format's mean gray
    is exact."""
    from food_panda_etl_spark.functions.multimodal import (
        _decode_payload,
        attach_payload_meta,
        decode_images,
        synth_bmp_payload,
        synth_jpeg_payload,
        synth_png_payload,
    )

    rows = [
        (0, synth_bmp_payload(9, 7, seed=5)),
        (1, synth_png_payload(8, 6, seed=5)),
        (2, synth_jpeg_payload(17, 11, seed=5)),
        (3, synth_jpeg_payload(18, 12, seed=6, subsample=True)),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = {
        r["media_id"]: r
        for r in decode_images(attach_payload_meta(df, fmt="mixed")).collect()
    }
    assert len(out) == 4
    for i, payload in rows:
        w, h, gray = _decode_payload(payload)
        assert out[i]["width"] == w and out[i]["height"] == h
        assert out[i]["mean_pixel"] == sum(gray) / len(gray)


def test_resize_nearest_and_area_match_naive_reference(spark):
    """Both resize modes equal a naive Python reference on real decoded
    BMPs: nearest = floor index map, area = integer box average
    (sum // count over floor-edged boxes, degenerate boxes widened to 1)."""
    from food_panda_etl_spark.functions.multimodal import (
        _decode_payload,
        resize_images,
        synth_bmp_payload,
    )

    rows = [(i, synth_bmp_payload(8 + i % 9, 6 + i % 5, seed=i)) for i in range(6)]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    ow, oh = 4, 3

    def naive(payload, mode):
        w, h, px = _decode_payload(payload)
        g = [[px[y * w + x] for x in range(w)] for y in range(h)]
        out = []
        for y in range(oh):
            for x in range(ow):
                if mode == "nearest":
                    out.append(g[y * h // oh][x * w // ow])
                else:
                    y0, y1 = y * h // oh, max((y + 1) * h // oh, y * h // oh + 1)
                    x0, x1 = x * w // ow, max((x + 1) * w // ow, x * w // ow + 1)
                    block = [g[yy][xx] for yy in range(y0, y1) for xx in range(x0, x1)]
                    out.append(sum(block) // len(block))
        return bytes(out)

    for mode in ("nearest", "area"):
        got = {
            r["media_id"]: r
            for r in resize_images(df, ow, oh, mode=mode).collect()
        }
        for i, payload in rows:
            want = naive(payload, mode)
            assert bytes(got[i]["pixels"]) == want, (mode, i)
            assert got[i]["width"] == ow and got[i]["height"] == oh
            assert got[i]["mean_pixel"] == sum(want) / len(want)


def test_resize_zero_area_degrades(spark):
    """A zero-area raster must resize to an empty thumbnail, not kill
    the task (the decode_images degradation convention)."""
    from food_panda_etl_spark.functions.multimodal import (
        resize_images,
        synth_image_payload,
    )

    df = spark.createDataFrame(
        [(0, synth_image_payload(0, 5, seed=1)),
         (1, synth_image_payload(6, 4, seed=2))],
        "media_id bigint, payload binary",
    )
    got = {r["media_id"]: r for r in resize_images(df, 4, 3).collect()}
    assert bytes(got[0]["pixels"]) == b"" and got[0]["mean_pixel"] == 0.0
    assert len(bytes(got[1]["pixels"])) == 12
