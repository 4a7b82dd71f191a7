from .parquet_metadata import (
    parquet_block_columns,
    parquet_blocks,
    parquet_metadata,
    parquet_partitions,
    parquet_schema,
)
from .bucketed import colocated_join, read_bucketed, write_bucketed
from .partitioned_write import write_partitioned_by

__all__ = [
    "write_bucketed",
    "read_bucketed",
    "colocated_join",
    "parquet_block_columns",
    "parquet_blocks",
    "parquet_metadata",
    "parquet_partitions",
    "parquet_schema",
    "write_partitioned_by",
]
