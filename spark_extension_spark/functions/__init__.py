""".Net ticks ↔ timestamp conversions and scalar helpers.

Parity: reference src/main/scala/uk/co/gresearch/spark/package.scala:104-409.
.Net ticks are 100 ns intervals since 0001-01-01T00:00:00 UTC; the unix
epoch is at tick 621_355_968_000_000_000.  All conversions are pure
column arithmetic (decimal where 100 ns precision must survive).
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..utils import count_null

__all__ = [
    "count_null",
    "dotnet_ticks_to_timestamp",
    "dotnet_ticks_to_unix_epoch",
    "dotnet_ticks_to_unix_epoch_nanos",
    "timestamp_to_dotnet_ticks",
    "unix_epoch_to_dotnet_ticks",
    "unix_epoch_nanos_to_dotnet_ticks",
]

# ticks between 0001-01-01 and 1970-01-01 (reference package.scala:113-115)
UNIX_EPOCH_DOTNET_TICKS = 621355968000000000
TICKS_PER_SECOND = 10_000_000
# largest tick count whose nanosecond representation fits in a long
MAX_NANOS_TICKS = 713589688368547758


def _col(c: Union[str, Column]) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dotnet_ticks_to_timestamp(column: Union[str, Column]) -> Column:
    """Ticks → ``TimestampType``, truncated to microseconds."""
    c = _col(column)
    seconds = (c.cast(T.DecimalType(19, 0)) - UNIX_EPOCH_DOTNET_TICKS) / TICKS_PER_SECOND
    return seconds.cast(T.TimestampType())


def dotnet_ticks_to_unix_epoch(column: Union[str, Column]) -> Column:
    """Ticks → unix epoch seconds as ``DecimalType`` keeping the full
    100 ns resolution."""
    c = _col(column)
    return (c.cast(T.DecimalType(19, 0)) - UNIX_EPOCH_DOTNET_TICKS) / TICKS_PER_SECOND


def dotnet_ticks_to_unix_epoch_nanos(column: Union[str, Column]) -> Column:
    """Ticks → unix epoch nanoseconds as long; null beyond the long
    overflow bound (reference package.scala:234-239)."""
    c = _col(column)
    return F.when(
        c <= MAX_NANOS_TICKS,
        (c.cast(T.LongType()) - UNIX_EPOCH_DOTNET_TICKS) * 100,
    )


def timestamp_to_dotnet_ticks(column: Union[str, Column]) -> Column:
    """Timestamp → ticks via its microsecond representation."""
    c = _col(column)
    return F.unix_micros(c.cast(T.TimestampType())) * 10 + UNIX_EPOCH_DOTNET_TICKS


def unix_epoch_to_dotnet_ticks(column: Union[str, Column]) -> Column:
    """Unix epoch seconds (any numeric) → ticks, respecting up to 100 ns
    fractional resolution."""
    c = _col(column)
    return (
        (c.cast(T.DecimalType(19, 7)) * TICKS_PER_SECOND).cast(T.LongType())
        + UNIX_EPOCH_DOTNET_TICKS
    )


def unix_epoch_nanos_to_dotnet_ticks(column: Union[str, Column]) -> Column:
    """Unix epoch nanoseconds → ticks (truncating to 100 ns)."""
    c = _col(column)
    return (c.cast(T.DecimalType(21, 0)) / 100).cast(T.LongType()) + UNIX_EPOCH_DOTNET_TICKS
