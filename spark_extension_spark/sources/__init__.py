from .parquet_metadata import (
    parquet_block_columns,
    parquet_blocks,
    parquet_metadata,
    parquet_partitions,
    parquet_schema,
)
from .partitioned_write import write_partitioned_by

__all__ = [
    "parquet_block_columns",
    "parquet_blocks",
    "parquet_metadata",
    "parquet_partitions",
    "parquet_schema",
    "write_partitioned_by",
]
