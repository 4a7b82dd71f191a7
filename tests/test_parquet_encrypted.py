"""Encrypted-parquet behavior against the reference's checked-in fixtures.

Parity: reference ParquetSuite.scala:353-417 ("read encrypted parquets"):
- encrypted1.parquet (plaintext footer, column `val` encrypted): metadata /
  schema / blocks / blockColumns readable with chunk-level fields nulled and
  the per-chunk `encrypted` flag set; partitions throws.
- encrypted2.parquet (encrypted footer): all five sources throw.

The fixtures are read-only reference files; no keys are configured, so the
"with decryption keys" half of the reference test is out of scope (pyarrow
KMS wiring is not available in this environment).
"""

import pytest

from spark_extension_spark.sources.footer_crypto import scan_footer_crypto
from spark_extension_spark.sources.parquet_metadata import (
    parquet_block_columns,
    parquet_blocks,
    parquet_metadata,
    parquet_partitions,
    parquet_schema,
)

PLAINTEXT_FOOTER_FILE = "/root/reference/src/test/files/encrypted1.parquet"
ENCRYPTED_FOOTER_FILE = "/root/reference/src/test/files/encrypted2.parquet"
PLAIN_FILE = "/root/testdata/sf0.001/nation.parquet"


def test_footer_scan_classification():
    c1 = scan_footer_crypto(PLAINTEXT_FOOTER_FILE)
    assert c1.encryption == "PLAINTEXT_FOOTER"
    # column 1 (`val`) of row group 0 is encrypted with a column key
    assert c1.encrypted_chunks == {(0, 1): ["val"]}
    assert c1.row_group_offsets == [4]

    c2 = scan_footer_crypto(ENCRYPTED_FOOTER_FILE)
    assert c2.encryption == "ENCRYPTED_FOOTER"

    c0 = scan_footer_crypto(PLAIN_FILE)
    assert c0.encryption == "UNENCRYPTED"
    assert c0.encrypted_chunks == {}


def test_metadata_plaintext_footer(spark):
    rows = parquet_metadata(spark, PLAINTEXT_FOOTER_FILE).collect()
    assert len(rows) == 1
    r = rows[0]
    # reference ParquetSuite.scala:375-377: Row(…, 1, null, null, 100, 2,
    # null, null, createdBy, schema, PLAINTEXT_FOOTER, keyValues)
    assert r["blocks"] == 1
    assert r["compressedBytes"] is None and r["uncompressedBytes"] is None
    assert r["rows"] == 100 and r["columns"] == 2
    assert r["values"] is None and r["nulls"] is None
    assert r["createdBy"] is not None and r["schema"] is not None
    assert r["encryption"] == "PLAINTEXT_FOOTER"
    assert "org.apache.spark.version" in r["keyValues"]


def test_schema_plaintext_footer(spark):
    rows = parquet_schema(spark, PLAINTEXT_FOOTER_FILE).orderBy("columnName").collect()
    # schema is plaintext: both columns fully described
    # (reference ParquetSuite.scala:380-386)
    assert [(r["columnName"], r["type"], r["repetition"]) for r in rows] == [
        ("id", "INT64", "REQUIRED"),
        ("val", "FLOAT", "REQUIRED"),
    ]


def test_blocks_plaintext_footer(spark):
    rows = parquet_blocks(spark, PLAINTEXT_FOOTER_FILE).collect()
    assert len(rows) == 1
    r = rows[0]
    # reference ParquetSuite.scala:388-391: Row(…, 1, 4, null, 1358, 100, 2,
    # null, null) — blockStart from the plaintext RowGroup.file_offset
    assert r["block"] == 1 and r["blockStart"] == 4
    assert r["compressedBytes"] is None
    assert r["uncompressedBytes"] == 1358
    assert r["rows"] == 100 and r["columns"] == 2
    assert r["values"] is None and r["nulls"] is None


def test_block_columns_plaintext_footer(spark):
    rows = (
        parquet_block_columns(spark, PLAINTEXT_FOOTER_FILE)
        .orderBy("column")
        .collect()
    )
    # reference ParquetSuite.scala:392-397: per-chunk fields all null, the
    # encrypted flag true only for the column-key-encrypted chunk
    assert [(r["column"], r["encrypted"]) for r in rows] == [
        (["id"], False),
        (["val"], True),
    ]
    for r in rows:
        for field in ("codec", "type", "encodings", "minValue", "maxValue",
                      "columnStart", "compressedBytes", "uncompressedBytes",
                      "values", "nulls"):
            assert r[field] is None, (r["column"], field)


def test_partitions_plaintext_footer_raises(spark):
    with pytest.raises(Exception, match="encrypted"):
        parquet_partitions(spark, PLAINTEXT_FOOTER_FILE).collect()


@pytest.mark.parametrize(
    "source",
    [parquet_metadata, parquet_schema, parquet_blocks, parquet_block_columns,
     parquet_partitions],
    ids=["metadata", "schema", "blocks", "block_columns", "partitions"],
)
def test_encrypted_footer_raises(spark, source):
    # reference ParquetSuite.scala:402-417: every source throws without keys
    with pytest.raises(Exception, match="(?i)encrypted"):
        source(spark, ENCRYPTED_FOOTER_FILE).collect()


def test_unencrypted_files_unaffected(spark):
    # the guard must not change behavior for normal files
    r = parquet_metadata(spark, PLAIN_FILE).collect()[0]
    assert r["encryption"] == "UNENCRYPTED"
    assert r["compressedBytes"] is not None and r["values"] is not None
    cols = parquet_block_columns(spark, PLAIN_FILE).collect()
    assert all(c["encrypted"] is False for c in cols)
    assert all(c["codec"] is not None for c in cols)
