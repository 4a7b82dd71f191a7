from .parquet_metadata import (
    parquet_block_columns,
    parquet_blocks,
    parquet_metadata,
    parquet_partitions,
    parquet_schema,
)
from .bucketed import colocated_join, read_bucketed, write_bucketed
from .layout import with_z_value, write_zordered, z_value
from .partitioned_write import write_partitioned_by
from .skipping import file_column_ranges, prune_files, read_pruned
from .compaction import compact_files, plan_compaction

__all__ = [
    "write_bucketed",
    "with_z_value",
    "write_zordered",
    "z_value",
    "read_bucketed",
    "colocated_join",
    "parquet_block_columns",
    "parquet_blocks",
    "parquet_metadata",
    "parquet_partitions",
    "parquet_schema",
    "write_partitioned_by",
    "file_column_ranges",
    "prune_files",
    "read_pruned",
    "plan_compaction",
    "compact_files",
]
