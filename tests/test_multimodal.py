"""Multimodal column plumbing tests."""

import pytest
from pyspark.sql import functions as F

from spark_extension_spark.operators.multimodal import (
    decode_images,
    make_fake_image_blob,
    sample_frame_indices,
    with_blob_metadata,
)


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
