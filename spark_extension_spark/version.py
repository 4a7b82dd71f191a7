"""Spark version introspection (reference SparkVersion.scala:22-34,
BuildVersion.scala:22-56)."""

from __future__ import annotations

from typing import Tuple

import pyspark

__all__ = [
    "spark_version",
    "spark_version_at_least",
    "SPARK_MAJOR",
    "SPARK_MINOR",
    "SPARK_PATCH",
]


def spark_version() -> Tuple[int, int, int]:
    """Installed PySpark version as ``(major, minor, patch)`` ints —
    build metadata (``+…``) and non-numeric suffixes stripped
    (reference SparkVersion.scala:22-34)."""
    parts = (pyspark.__version__.split("+")[0].split(".") + ["0", "0"])[:3]
    nums = []
    for p in parts:
        # take the LEADING digit run only: '0rc1' / '0-preview2' must
        # parse as 0, not concatenate into 1 / 2 — otherwise a 4.1.0
        # pre-release reads as 4.1.2 and version gates take the wrong
        # branch
        digits = ""
        for ch in p:
            if not ch.isdigit():
                break
            digits += ch
        nums.append(int(digits or 0))
    return tuple(nums)


SPARK_MAJOR, SPARK_MINOR, SPARK_PATCH = spark_version()


def spark_version_at_least(major: int, minor: int = 0, patch: int = 0) -> bool:
    """True iff the installed PySpark is at or above the given version
    (lexicographic on the ``(major, minor, patch)`` tuple)."""
    return spark_version() >= (major, minor, patch)
