from .partitioned_write import write_partitioned_by

__all__ = ["write_partitioned_by"]
