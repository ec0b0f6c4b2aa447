"""Multimodal column plumbing: media struct, lazy local fetch, fake-image
decode, byte features, frame sampling."""

import pytest
from pyspark.sql import functions as F

from waimak_spark import multimodal as M


@pytest.fixture()
def media_files(tmp_path):
    paths = []
    for i, payload in enumerate([b"hello world", b"\x00\x01\x02", b"x" * 100]):
        p = tmp_path / f"blob{i}.bin"
        p.write_bytes(payload)
        paths.append((i, str(p)))
    return paths


class TestMediaStruct:
    def test_attach_media_schema(self, spark, media_files):
        df = spark.createDataFrame(media_files, "id int, path string")
        out = M.attach_media(df, "path", "application/octet-stream")
        got = out.schema["media"].dataType
        assert [(f.name, f.dataType.simpleString()) for f in got.fields] == \
            [(f.name, f.dataType.simpleString()) for f in M.MEDIA_SCHEMA.fields]
        row = out.collect()[0]
        assert row["media"]["data"] is None  # lazy until fetched
        assert row["media"]["media_type"] == "application/octet-stream"

    def test_lazy_fetch_reads_local_files(self, spark, media_files):
        df = M.attach_media(
            spark.createDataFrame(media_files, "id int, path string"),
            "path", "application/octet-stream")
        fetched = M.lazy_fetch(df)
        got = {r["id"]: bytes(r["media"]["data"]) for r in fetched.collect()}
        assert got[0] == b"hello world"
        assert got[1] == b"\x00\x01\x02"
        assert len(got[2]) == 100

    def test_lazy_fetch_custom_fetcher(self, spark, media_files):
        df = M.attach_media(
            spark.createDataFrame(media_files, "id int, path string"),
            "path", "x")
        fetched = M.lazy_fetch(df, fetcher=lambda uri: uri.encode()[:4])
        row = fetched.where(F.col("id") == 0).collect()[0]
        assert bytes(row["media"]["data"]) == media_files[0][1].encode()[:4]


class TestDecodeAndFeatures:
    def test_fake_image_roundtrip(self, spark):
        df = spark.createDataFrame([(1, 640, 480, 3, "pixels" * 10)],
                                   "id int, w int, h int, c int, px string")
        payload = M.fake_image_payload(F.col("w"), F.col("h"), F.col("c"),
                                       F.col("px"))
        decoded = M.decode_image(df.select("id", payload.alias("data")))
        img = decoded.collect()[0]["image"]
        assert (img["width"], img["height"], img["channels"]) == (640, 480, 3)
        assert img["n_pixel_bytes"] == 60

    def test_unknown_format_raises_not_implemented(self, spark):
        df = spark.createDataFrame([(1, bytearray(b"\x89PNG...."))],
                                   "id int, data binary")
        with pytest.raises(Exception) as e:
            M.decode_image(df).collect()
        assert "NotImplementedError" in str(e.value) or isinstance(
            e.value, NotImplementedError)

    def test_byte_features(self, spark):
        df = spark.createDataFrame([(1, bytearray(b"abc")), (2, None)],
                                   "id int, data binary")
        rows = {r["id"]: r["features"]
                for r in M.byte_features(df).collect()}
        assert rows[1]["n_bytes"] == 3
        assert rows[1]["first_byte"] == ord("a")
        assert rows[1]["byte_sum"] == ord("a") + ord("b") + ord("c")
        assert rows[2]["n_bytes"] == 0

    def test_frame_sample(self, spark):
        data = bytes(range(10)) * 64  # 640 bytes → 10 frames of 64
        df = spark.createDataFrame([(1, bytearray(data))],
                                   "id int, data binary")
        out = M.frame_sample(df, frame_size=64, every_n=2).collect()[0]
        assert out["n_frames"] == 10
        assert out["n_sampled"] == 5
        assert len(bytes(out["sampled"])) == 5 * 64

    def test_resize_image_nearest_neighbour(self, spark):
        # 2×2 single-channel image with pixels 'abcd' → upscale to 4×4
        df = spark.createDataFrame([(1, 2, 2, 1, "abcd")],
                                   "id int, w int, h int, c int, px string")
        payload = M.fake_image_payload(F.col("w"), F.col("h"), F.col("c"),
                                       F.col("px"))
        out = M.resize_image(df.select("id", payload.alias("data")),
                             out_w=4, out_h=4).collect()[0]
        b = bytes(out["resized"])
        assert b[:8] == M.FAKE_IMAGE_MAGIC
        assert (int(b[8:12]), int(b[12:16]), int(b[16:17])) == (4, 4, 1)
        # nearest-neighbour: each source pixel becomes a 2×2 block
        px = b[17:].decode()
        assert px == "aabb" "aabb" "ccdd" "ccdd"
        # downscale back to 2×2 returns the original pixels
        out2 = M.resize_image(
            M.resize_image(df.select("id", payload.alias("data")),
                           out_w=4, out_h=4),
            out_w=2, out_h=2, data_col="resized", out_col="small").collect()[0]
        assert bytes(out2["small"])[17:].decode() == "abcd"

    def test_resize_unknown_format_raises(self, spark):
        df = spark.createDataFrame([(1, bytearray(b"JFIFxxxx"))],
                                   "id int, data binary")
        with pytest.raises(Exception) as e:
            M.resize_image(df, 2, 2).collect()
        assert "NotImplementedError" in str(e.value) or isinstance(
            e.value, NotImplementedError)


def _png_bytes(w: int, h: int, color_type: int) -> bytes:
    """A real PNG signature + IHDR chunk (what the header parser reads —
    no IDAT needed for dimension extraction)."""
    import struct
    import zlib

    ihdr = struct.pack(">II5B", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13) + b"IHDR" + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))


def _jpeg_bytes(w: int, h: int, components: int) -> bytes:
    """SOI + APP0(JFIF) + SOF0 — the marker walk the parser performs."""
    import struct

    app0 = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + b"\x01\x01\x00" + b"\x00\x01\x00\x01\x00\x00")
    sof0 = (b"\xff\xc0" + struct.pack(">H", 8 + 3 * components) + b"\x08"
            + struct.pack(">HH", h, w) + bytes([components])
            + b"\x01\x11\x00" * components)
    return b"\xff\xd8" + app0 + sof0


class TestRealFormatHeaders:
    """The real-format branch of _decode_one: pure-Python PNG/JPEG/GIF
    header parsing, covered in-sandbox with hand-built magic bytes (round
    6 — previously this branch needed Pillow and was skip-marked here).
    Pillow remains the fallback for formats without a parser."""

    def test_png_rgb_header(self, spark):
        df = spark.createDataFrame([(1, bytearray(_png_bytes(7, 5, 2)))],
                                   "id int, data binary")
        img = M.decode_image(df).collect()[0]["image"]
        assert (img["width"], img["height"], img["channels"]) == (7, 5, 3)
        assert img["n_pixel_bytes"] == len(_png_bytes(7, 5, 2))

    def test_png_band_counts_match_pillow_convention(self, spark):
        # color types: gray, RGB, palette, gray+alpha, RGBA
        rows = [(ct, bytearray(_png_bytes(3, 2, ct)))
                for ct in (0, 2, 3, 4, 6)]
        df = spark.createDataFrame(rows, "ct int, data binary")
        got = {r["ct"]: r["image"]["channels"]
               for r in M.decode_image(df).collect()}
        assert got == {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

    def test_jpeg_sof_header(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(_jpeg_bytes(640, 480, 3)))],
            "id int, data binary")
        img = M.decode_image(df).collect()[0]["image"]
        assert (img["width"], img["height"], img["channels"]) == (640, 480, 3)

    def test_jpeg_single_component(self, spark):
        df = spark.createDataFrame([(1, bytearray(_jpeg_bytes(3, 2, 1)))],
                                   "id int, data binary")
        img = M.decode_image(df).collect()[0]["image"]
        assert (img["width"], img["height"], img["channels"]) == (3, 2, 1)

    def test_gif_header(self, spark):
        import struct

        gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 4
        df = spark.createDataFrame([(1, bytearray(gif))],
                                   "id int, data binary")
        img = M.decode_image(df).collect()[0]["image"]
        assert (img["width"], img["height"], img["channels"]) == (12, 34, 1)

    def test_truncated_signature_still_raises(self, spark):
        # full 8-byte PNG signature required: a prefix match must not be
        # parsed as PNG — it falls through to the no-codec error
        df = spark.createDataFrame([(1, bytearray(b"\x89PNGxxxx____"))],
                                   "id int, data binary")
        with pytest.raises(Exception) as e:
            M.decode_image(df).collect()
        assert "NotImplementedError" in str(e.value) or isinstance(
            e.value, NotImplementedError)


class TestByteFeaturesVectorized:
    def test_large_payload_sum_exact(self, spark):
        # 100 KB payload: int64-accumulated numpy sum must stay exact
        payload = bytes(range(256)) * 400
        df = spark.createDataFrame([(1, bytearray(payload))],
                                   "id int, data binary")
        row = M.byte_features(df).collect()[0]["features"]
        assert row["n_bytes"] == 102400
        assert row["byte_sum"] == sum(range(256)) * 400
        assert row["first_byte"] == 0 and row["last_byte"] == 255

    def test_empty_and_null_payloads(self, spark):
        df = spark.createDataFrame([(1, bytearray(b"")), (2, None)],
                                   "id int, data binary")
        rows = {r["id"]: r["features"]
                for r in M.byte_features(df).collect()}
        for i in (1, 2):
            assert rows[i]["n_bytes"] == 0 and rows[i]["byte_sum"] == 0
            assert rows[i]["first_byte"] is None
