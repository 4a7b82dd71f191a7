"""Opt-in DataFrame/DataFrameReader extension registration — the
reference's Python package monkey-patches ``DataFrame.diff`` etc. on
import (python/gresearch/spark/diff/__init__.py:902-913); here the
patching is explicit:

    import spark_extension_spark as sx
    sx.install()          # adds df.diff, df.histogram, ... methods

Every method remains available as a plain function; ``install()`` is
sugar for fluent chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .operators.dedup import (
    duplicate_clusters,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from .operators.diff import diff, diff_with
from .operators.histogram import histogram
from .operators.row_numbers import with_row_numbers
from .operators.sorted_groups import group_by_sorted
from .operators.text import with_quality_metrics
from .sources.partitioned_write import write_partitioned_by

__all__ = ["install", "uninstall"]

_METHODS = {
    "diff": diff,
    "diff_with": diff_with,
    "histogram": histogram,
    "with_row_numbers": with_row_numbers,
    "group_by_sorted": group_by_sorted,
    "write_partitioned_by": write_partitioned_by,
    "exact_dedup": exact_dedup,
    "duplicate_clusters": duplicate_clusters,
    "minhash_signatures": minhash_signatures,
    "minhash_lsh_pairs": minhash_lsh_pairs,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "simhash": simhash,
    "with_quality_metrics": with_quality_metrics,
}


_installed: dict = {}
_MISSING = object()
_shadowed: dict = {}


def install() -> None:
    """Attach the extension methods to ``DataFrame``.  Any attribute
    already present under one of these names (e.g. a genuine method a
    future Spark version defines) is stashed and restored by
    :func:`uninstall` — never silently destroyed."""
    import warnings

    for name, fn in _METHODS.items():
        cur = DataFrame.__dict__.get(name, _MISSING)
        # don't re-stash a name whose stash survived a prior uninstall
        # (foreign code held the slot then): overwriting would replace
        # the genuine pre-install attribute with the foreign one
        if name not in _installed and name not in _shadowed:
            _shadowed[name] = cur
        elif (
            cur is not _MISSING
            and cur is not fn
            and cur is not _installed.get(name)
            and cur is not _shadowed.get(name, _MISSING)
        ):
            # the slot holds foreign code that was never stashed (it
            # arrived after our stash was taken) — it cannot be
            # preserved without discarding the genuine original, so
            # overwrite it loudly, not silently
            warnings.warn(
                f"install(): DataFrame.{name} holds code patched by a "
                "third party since the last install(); overwriting it "
                "(the original pre-install attribute remains stashed)",
                stacklevel=2,
            )
        setattr(DataFrame, name, fn)
        _installed[name] = fn


def uninstall() -> None:
    """Remove only the attributes this package set, restoring any
    attribute that existed before :func:`install` shadowed it; a name
    that now holds something else entirely (re-patched by other code
    after install) is left untouched — and its stash is RETAINED, so a
    later install/uninstall cycle can still restore the genuine
    pre-install attribute once the foreign patch is gone."""
    import warnings

    for name, fn in list(_installed.items()):
        if getattr(DataFrame, name, None) is fn:
            prior = _shadowed.pop(name, _MISSING)
            if prior is _MISSING:
                delattr(DataFrame, name)
            else:
                setattr(DataFrame, name, prior)
        elif name in _shadowed:
            warnings.warn(
                f"uninstall(): DataFrame.{name} was re-patched by other "
                "code after install(); leaving it (and the stashed "
                "original) in place",
                stacklevel=2,
            )
        del _installed[name]
