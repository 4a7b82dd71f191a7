from .comparators import (
    DiffComparator,
    DiffComparators,
    DefaultDiffComparator,
    NullSafeEqualDiffComparator,
    EpsilonDiffComparator,
    StringDiffComparator,
    WhitespaceDiffComparator,
    DurationDiffComparator,
    MapDiffComparator,
    EquivDiffComparator,
)
from .diff import DiffMode, DiffOptions, Differ, diff, diff_with
from .histogram import histogram
from .row_numbers import with_row_numbers
from .sorted_groups import (
    KeySortedGroups,
    SortedGroupByDataFrame,
    group_by_key_sorted,
    group_by_sorted,
)
from .packing import pack_blocks, with_running_total
from .sampling import (
    assign_splits,
    hash_sample,
    hash_uniform,
    resample_to_mix,
    stratified_sample,
)
from .text import (
    deterministic_shuffle,
    dup_ngram_fraction,
    heavy_hitters,
    scrub_pii,
    with_scrubbed_pii,
    fingerprint,
    language_id,
    normalize_text,
    quality_metrics,
    regex_token_count,
    repetition_metrics,
    token_count,
    with_quality_metrics,
)
from .dedup import (
    connected_components,
    near_dup_clusters,
    duplicate_clusters,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash,
)
from .similarity import (
    brute_force_topk,
    semantic_dedup,
    semantic_near_dup_pairs,
    cosine_similarity,
    embedding_near_dup_pairs,
    rp_lsh_topk,
)
from .asof import asof_join
from .timeseries import (
    range_join_bands,
    session_summary,
    sessionize,
    time_bucket,
    time_bucket_rollup,
)
from .skew import salted_join, with_salt
from .ranking import bm25_score, document_frequencies, term_frequencies, tfidf
from .decontam import contamination_flags, decontaminate
from .multimodal import (
    blob_metadata,
    decode_images,
    make_fake_image_blob,
    sample_frame_indices,
    with_blob_metadata,
)

__all__ = [
    "resample_to_mix",
    "dup_ngram_fraction",
    "heavy_hitters",
    "semantic_dedup",
    "semantic_near_dup_pairs",
    "bm25_score",
    "document_frequencies",
    "term_frequencies",
    "tfidf",
    "contamination_flags",
    "decontaminate",
    "DiffComparator",
    "DiffComparators",
    "DefaultDiffComparator",
    "NullSafeEqualDiffComparator",
    "EpsilonDiffComparator",
    "StringDiffComparator",
    "WhitespaceDiffComparator",
    "DurationDiffComparator",
    "MapDiffComparator",
    "EquivDiffComparator",
    "DiffMode",
    "DiffOptions",
    "Differ",
    "diff",
    "diff_with",
    "histogram",
    "with_row_numbers",
    "SortedGroupByDataFrame",
    "group_by_sorted",
    "group_by_key_sorted",
    "KeySortedGroups",
    "deterministic_shuffle",
    "scrub_pii",
    "with_scrubbed_pii",
    "pack_blocks",
    "with_running_total",
    "assign_splits",
    "hash_sample",
    "hash_uniform",
    "stratified_sample",
    "fingerprint", "language_id", "normalize_text", "quality_metrics",
    "regex_token_count",
    "repetition_metrics", "token_count", "with_quality_metrics",
    "duplicate_clusters", "exact_dedup", "minhash_lsh_pairs",
    "minhash_signatures", "ngram_jaccard_pairs", "shingles", "simhash",
    "brute_force_topk", "cosine_similarity", "embedding_near_dup_pairs",
    "rp_lsh_topk",
    "asof_join",
    "range_join_bands", "time_bucket", "time_bucket_rollup",
    "sessionize", "session_summary",
    "salted_join", "with_salt",
    "blob_metadata", "decode_images", "make_fake_image_blob",
    "sample_frame_indices", "with_blob_metadata",
]
