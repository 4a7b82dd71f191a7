"""Multimodal columns: images/audio/video as opaque ``binary`` columns
with typed metadata, plus decode/feature-extract plumbing.

Design: a multimodal dataset is just a DataFrame with a ``binary``
column and a ``map<string,string>`` metadata column — partitioning,
predicate pushdown on metadata, and columnar storage all come for free
from parquet + Catalyst.  Heavy per-blob work (decode, resize, feature
extraction) runs in Arrow-batched ``mapInPandas`` so bytes cross the
JVM/Python boundary once per batch, not per row.

The actual image/audio codecs are NOT available in this environment, so
the decode kernels are STUBS: blobs in the deterministic ``FAKE``
container format (see :func:`make_fake_image_blob`) decode for real;
anything else raises ``NotImplementedError`` (swap in PIL/ffmpeg in
production).  Everything around the stub — schemas, batching, UDF
signatures, partition behavior — is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "make_fake_image_blob",
    "blob_metadata",
    "with_blob_metadata",
    "decode_images",
    "sample_frame_indices",
]

_MAGICS = [
    (b"IMG1", "fake-image"),
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),
]


def make_fake_image_blob(text: Column, width: Column, height: Column) -> Column:
    """Deterministic stand-in for real image bytes: an ``IMG1`` header
    with dimensions, then the payload.  Lets the full pipeline run
    end-to-end without codec libraries."""
    header = F.concat_ws("|", F.lit("IMG1"), width.cast("string"), height.cast("string"))
    return F.encode(F.concat(header, F.lit("|"), text), "utf-8")


def blob_metadata(blob: Column) -> dict:
    """Cheap, codec-free metadata — pure column expressions over the
    raw bytes: size, checksum, container sniff from magic bytes."""
    fmt = F.lit("unknown")
    # compare raw binary prefixes — decode() would throw on non-UTF8
    # magic bytes under Spark 4's ANSI mode
    for magic, name in reversed(_MAGICS):
        fmt = F.when(F.substring(blob, 1, len(magic)) == F.lit(magic), name).otherwise(fmt)
    return {
        "size_bytes": F.length(blob),
        "crc32": F.crc32(blob),
        "format": fmt,
    }


def with_blob_metadata(df: DataFrame, blob_col: str = "blob", prefix: str = "m_") -> DataFrame:
    """Input plus every :func:`blob_metadata` column (prefixed) — a
    scan-speed projection over the binary column, no decode."""
    cols = blob_metadata(F.col(blob_col))
    return df.select("*", *[c.alias(prefix + k) for k, c in cols.items()])


def decode_images(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Decode image blobs to (id, width, height, payload_bytes).

    Arrow-batched ``mapInPandas``: the kernel sees pandas batches of raw
    bytes — exactly where PIL/libvips would plug in.  STUB: only the
    ``FAKE`` container decodes; real formats raise ``NotImplementedError``.
    """
    id_name, blob_name = id_col, blob_col

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widths, heights, sizes = [], [], [], []
            for doc_id, raw in zip(pdf[id_name], pdf[blob_name]):
                data = bytes(raw)
                if not data.startswith(b"IMG1|"):
                    raise NotImplementedError(
                        "real image decoding requires PIL/libvips; only the "
                        "deterministic FAKE container is supported in this build"
                    )
                _, w, h, payload = data.split(b"|", 3)
                ids.append(doc_id)
                widths.append(int(w))
                heights.append(int(h))
                sizes.append(len(payload))
            yield pd.DataFrame(
                {id_name: ids, "width": widths, "height": heights,
                 "payload_bytes": sizes}
            )

    return df.select(id_name, blob_name).mapInPandas(
        kernel, f"{id_name} long, width int, height int, payload_bytes long"
    )


def sample_frame_indices(
    n_frames: Column, every: int = 10, max_frames: int = 32
) -> Column:
    """Deterministic frame sampling plan for video blobs: every
    ``every``-th frame, capped — pure column expression, the shape a
    frame-extraction kernel consumes."""
    last = F.least(n_frames - 1, F.lit((max_frames - 1) * every))
    return F.when(n_frames > 0, F.sequence(F.lit(0), last, F.lit(every))).otherwise(
        F.array().cast("array<int>")
    )
