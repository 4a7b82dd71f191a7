"""Multimodal column plumbing tests."""

import pytest
from pyspark.sql import functions as F

from spark_extension_spark.operators.multimodal import (
    _optional_pil,
    _optional_soundfile,
    decode_images,
    make_fake_image_blob,
    sample_frame_indices,
    with_blob_metadata,
)


def _has_pil() -> bool:
    return _optional_pil() is not None


def _has_soundfile() -> bool:
    return _optional_soundfile() is not None


@pytest.fixture(scope="module")
def blobs(spark):
    docs = spark.createDataFrame(
        [(1, "payload one"), (2, "longer payload here")], ["doc_id", "text"]
    )
    return docs.select(
        "doc_id",
        make_fake_image_blob(
            F.col("text"), (F.col("doc_id") % 64 + 1), (F.col("doc_id") % 48 + 1)
        ).alias("blob"),
    )


def test_blob_metadata(blobs):
    out = with_blob_metadata(blobs)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["m_format"] == "fake-image"
    assert rows[1]["m_size_bytes"] == len(b"IMG1|2|2|payload one")
    assert rows[1]["m_crc32"] is not None


def test_blob_metadata_real_magics(spark):
    df = spark.createDataFrame([(1, bytearray(b"\x89PNG\r\n")), (2, bytearray(b"\xff\xd8\xffdata"))],
                               "id long, blob binary")
    rows = {r["id"]: r["m_format"] for r in with_blob_metadata(df).collect()}
    assert rows == {1: "png", 2: "jpeg"}


def test_decode_images(blobs):
    decoded = decode_images(blobs)
    assert decoded.columns == ["doc_id", "width", "height", "payload_bytes"]
    rows = {r["doc_id"]: r for r in decoded.collect()}
    assert rows[1]["width"] == 2 and rows[1]["height"] == 2
    assert rows[2]["width"] == 3 and rows[2]["height"] == 3
    assert rows[1]["payload_bytes"] == len("payload one")


@pytest.mark.skipif(_has_pil(), reason="PIL installed: real images decode")
def test_decode_images_unsupported_format(spark):
    df = spark.createDataFrame([(1, bytearray(b"\x89PNGxxxx"))], "doc_id long, blob binary")
    with pytest.raises(Exception, match="NotImplementedError|real image decoding"):
        decode_images(df).collect()


def test_sample_frame_indices(spark):
    df = spark.createDataFrame([(100,), (5,), (0,)], ["n"])
    rows = df.select(sample_frame_indices(F.col("n"), every=10).alias("idx")).collect()
    assert rows[0]["idx"] == list(range(0, 100, 10))
    assert rows[1]["idx"] == [0]
    assert rows[2]["idx"] == []


# ---------------------------------------------------------------------------
# resize_images / sample_frames
# ---------------------------------------------------------------------------


def test_resize_images_fit_within(spark):
    from spark_extension_spark.operators.multimodal import (
        decode_images, make_fake_image_blob, resize_images)

    df = spark.createDataFrame(
        [(1, "x" * 100, 200, 100), (2, "y" * 50, 10, 10), (3, "z" * 64, 64, 256)],
        ["doc_id", "text", "w", "h"],
    )
    blobs = df.select(
        "doc_id", make_fake_image_blob(F.col("text"), F.col("w"), F.col("h")).alias("blob")
    )
    out = {r["doc_id"]: r for r in resize_images(blobs, 64, 64).collect()}
    # 200x100 -> scale 0.32 -> 64x32; payload shrinks by pixel ratio
    assert (out[1]["out_width"], out[1]["out_height"]) == (64, 32)
    # already fits: never upscaled, payload untouched
    assert (out[2]["out_width"], out[2]["out_height"]) == (10, 10)
    assert bytes(out[2]["blob"]).endswith(b"y" * 50)
    # 64x256 -> scale 0.25 -> 16x64
    assert (out[3]["out_width"], out[3]["out_height"]) == (16, 64)
    # resized blobs chain straight into decode_images
    decoded = {r["doc_id"]: r for r in decode_images(resize_images(blobs, 64, 64)).collect()}
    assert decoded[1]["width"] == 64 and decoded[1]["height"] == 32
    assert decoded[1]["payload_bytes"] == (100 * 64 * 32) // (200 * 100)


def test_sample_frames_fan_out(spark):
    from spark_extension_spark.operators.multimodal import (
        make_fake_video_blob, sample_frames)

    df = spark.createDataFrame(
        [(1, "abcdefghij" * 10, 25, 4), (2, "pq", 1, 2), (3, "", 0, 4)],
        ["doc_id", "text", "n", "fb"],
    )
    blobs = df.select(
        "doc_id",
        make_fake_video_blob(F.col("text"), F.col("n"), F.col("fb")).alias("blob"),
    )
    rows = sample_frames(blobs, every=10, max_frames=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 25 frames, every 10th, cap 3 -> indices 0, 10, 20
    assert sorted(r["frame_index"] for r in by_doc[1]) == [0, 10, 20]
    f0 = next(r for r in by_doc[1] if r["frame_index"] == 0)
    assert bytes(f0["frame"]) == b"abcd" and f0["frame_size"] == 4
    # payload is 100 bytes = exactly 25 frames of 4: last frame is full
    f20 = next(r for r in by_doc[1] if r["frame_index"] == 20)
    assert f20["frame_size"] == 4
    # doc 2: single short frame
    assert [r["frame_index"] for r in by_doc[2]] == [0]
    assert bytes(by_doc[2][0]["frame"]) == b"pq"
    # doc 3: zero frames -> no rows
    assert 3 not in by_doc


@pytest.mark.skipif(_has_pil(), reason="PIL installed: real images decode")
def test_multimodal_stubs_reject_real_formats(spark):
    import pytest as _pytest
    from spark_extension_spark.operators.multimodal import resize_images, sample_frames

    png = spark.createDataFrame([(1, bytearray(b"\x89PNG1234"))], ["doc_id", "blob"])
    with _pytest.raises(Exception, match="NotImplementedError|FAKE"):
        resize_images(png, 8, 8).collect()
    with _pytest.raises(Exception, match="NotImplementedError|FAKE"):
        sample_frames(png).collect()


class TestRealCodecs:
    """Real-codec paths, exercised only when the optional library is
    installed (skip-if-absent): the FAKE-container oracle paths above
    run either way and are unaffected."""

    @pytest.mark.skipif(not _has_pil(), reason="PIL not installed")
    def test_real_png_decode_resize_ahash(self, spark):
        import io

        from PIL import Image

        from spark_extension_spark.operators.multimodal import (
            image_ahash,
            resize_images,
        )

        buf = io.BytesIO()
        Image.new("RGB", (32, 16), (200, 10, 10)).save(buf, format="PNG")
        df = spark.createDataFrame(
            [(1, bytearray(buf.getvalue()))], "doc_id long, blob binary"
        )
        dec = decode_images(df).collect()[0]
        assert (dec["width"], dec["height"]) == (32, 16)
        assert dec["payload_bytes"] == len(buf.getvalue())

        rs = resize_images(df, 8, 8).collect()[0]
        assert (rs["width"], rs["height"]) == (32, 16)
        assert (rs["out_width"], rs["out_height"]) == (8, 4)
        with Image.open(io.BytesIO(bytes(rs["blob"]))) as im:
            assert (im.width, im.height) == (8, 4)

        bands = image_ahash(df).collect()[0]["bands"]
        assert len(bands) == 8 and all(0 <= b <= 255 for b in bands)
        # uniform image: no cell mean strictly exceeds the global mean
        assert bands == [0] * 8

    @pytest.mark.skipif(not _has_soundfile(), reason="soundfile not installed")
    def test_real_wav_stats(self, spark):
        import io

        import numpy as np
        import soundfile as sf

        from spark_extension_spark.operators.multimodal import audio_stats

        samples = np.array([0, 1000, -2000, 500], dtype=np.int16)
        buf = io.BytesIO()
        sf.write(buf, samples, 8000, format="WAV", subtype="PCM_16")
        df = spark.createDataFrame(
            [(1, bytearray(buf.getvalue()))], "doc_id long, blob binary"
        )
        row = audio_stats(df).collect()[0]
        assert row["sample_rate"] == 8000
        assert row["n_samples"] == 4
        assert row["duration_ms"] == 4 * 1000 // 8000
        assert row["energy"] == int((samples.astype(np.int64) ** 2).sum())
        assert row["peak"] == 2000


class TestImageAHash:
    @staticmethod
    def _ref_hash(payload: bytes):
        L = len(payload)
        if L == 0:
            return [0] * 8
        cells = [[] for _ in range(64)]
        for p, b in enumerate(payload):
            cells[p * 64 // L].append(b)
        total = sum(payload)
        bits = [
            1 if (sum(c) * L > total * len(c)) else 0 if c else 0
            for c in cells
        ]
        return [
            sum(bits[8 * j + k] << (7 - k) for k in range(8)) for j in range(8)
        ]

    def test_matches_reference_and_empty(self, spark):
        import pyspark.sql.functions as F

        from spark_extension_spark.operators.multimodal import (
            image_ahash,
            make_fake_image_blob,
        )

        texts = ["hello world " * 20, "aAbBcC" * 50, "x", ""]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        ).select(
            "doc_id",
            make_fake_image_blob(F.col("text"), F.lit(8), F.lit(8)).alias("blob"),
        )
        got = {r["doc_id"]: list(r["bands"]) for r in image_ahash(df).collect()}
        for i, t in enumerate(texts):
            assert got[i] == self._ref_hash(t.encode()), f"doc {i}"
        assert got[3] == [0] * 8  # empty payload -> all-zero hash

    def test_near_dup_pairs_planted(self, spark):
        import pyspark.sql.functions as F

        from spark_extension_spark.operators.multimodal import (
            ahash_near_dup_pairs,
            make_fake_image_blob,
        )

        base = "the quick brown fox jumps over the lazy dog " * 30
        light_edit = base[:-6] + "cat043"          # tiny tail change
        unrelated = "".join(chr(33 + (i * 7) % 90) for i in range(1200))
        rows = [(0, base), (1, base), (2, light_edit), (3, unrelated)]
        df = spark.createDataFrame(rows, ["doc_id", "text"]).select(
            "doc_id",
            make_fake_image_blob(F.col("text"), F.lit(8), F.lit(8)).alias("blob"),
        )
        pairs = {(r["id_a"], r["id_b"]): r["hamming"]
                 for r in ahash_near_dup_pairs(df, max_distance=7).collect()}
        assert pairs[(0, 1)] == 0              # identical images
        assert (0, 2) in pairs                 # light edit survives
        assert all(3 not in p for p in pairs)  # unrelated image not paired

        # partitioning independence
        again = {(r["id_a"], r["id_b"]): r["hamming"]
                 for r in ahash_near_dup_pairs(df.repartition(5), max_distance=7).collect()}
        assert pairs == again

    def test_guards(self, spark):
        import pytest as _pytest

        from spark_extension_spark.operators.multimodal import (
            ahash_near_dup_pairs,
            image_ahash,
        )

        df = spark.createDataFrame([(1, bytearray(b"PNG-not-fake"))], ["doc_id", "blob"])
        with _pytest.raises(ValueError):
            ahash_near_dup_pairs(df, max_distance=8)
        if not _has_pil():  # with PIL the failure is PIL's, not the stub's
            with _pytest.raises(Exception, match="NotImplementedError|FAKE"):
                image_ahash(df).collect()

    def test_unpersist_handle_releases_signature_cache(self, spark):
        from spark_extension_spark.operators.multimodal import (
            ahash_near_dup_pairs,
            make_fake_image_blob,
        )
        from spark_extension_spark.utils import UnpersistHandle

        df = spark.createDataFrame(
            [(0, "abcabc"), (1, "abcabc")], ["doc_id", "text"]
        ).select(
            "doc_id",
            make_fake_image_blob(F.col("text"), F.lit(4), F.lit(4)).alias("blob"),
        )
        def cached_ids():
            return {
                i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
            }

        # set-based, not count-based: earlier tests' leftovers may be
        # GC'd concurrently; assert only that nothing NEW survives
        before = cached_ids()
        handle = UnpersistHandle()
        pairs = ahash_near_dup_pairs(df, unpersist_handle=handle)
        assert pairs.count() >= 1
        assert cached_ids() - before
        handle()
        assert not (cached_ids() - before)


class TestAudioStats:
    def test_matches_reference(self, spark):
        import pyspark.sql.functions as F

        from spark_extension_spark.operators.multimodal import (
            audio_stats,
            make_fake_audio_blob,
        )

        texts = ["abc", "", "hello world"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        ).select(
            "doc_id",
            make_fake_audio_blob(F.col("text"), F.lit(16000)).alias("blob"),
        )
        got = {r["doc_id"]: r for r in audio_stats(df).collect()}
        for i, t in enumerate(texts):
            b = t.encode()
            assert got[i]["sample_rate"] == 16000
            assert got[i]["n_samples"] == len(b)
            assert got[i]["duration_ms"] == len(b) * 1000 // 16000
            assert got[i]["energy"] == sum(x * x for x in b)
            assert got[i]["peak"] == (max(b) if b else 0)

    @pytest.mark.skipif(
        _has_soundfile(), reason="soundfile installed: real audio decodes"
    )
    def test_non_fake_raises(self, spark):
        import pytest as _pytest

        from spark_extension_spark.operators.multimodal import audio_stats

        df = spark.createDataFrame([(1, bytearray(b"RIFF...."))], ["doc_id", "blob"])
        with _pytest.raises(Exception, match="NotImplementedError|FAKE"):
            audio_stats(df).collect()


def test_resize_zero_dimension_blob_does_not_crash(spark):
    # nothing validates dims at blob creation; a 0-width FAKE blob must
    # clamp to 1px, not ZeroDivisionError the whole task
    from spark_extension_spark.operators.multimodal import (
        make_fake_image_blob,
        resize_images,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "payload")], ["doc_id", "text"]).select(
        "doc_id", make_fake_image_blob(F.col("text"), F.lit(0), F.lit(10)).alias("blob")
    )
    row = resize_images(df, 4, 4).collect()[0]
    assert row["out_width"] >= 1 and row["out_height"] >= 1
