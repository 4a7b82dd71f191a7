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
from .packing import length_batches, pack_blocks, padding_report, with_running_total
from .importance import (
    hashed_gram_counts,
    importance_model,
    importance_weights,
    select_by_importance,
)
from .dedup import leakage_safe_splits, winnow_fingerprints, winnow_overlap_pairs
from .sampling import interleave_by_mix, repeat_upsample
from .profile import check_constraints, psi_report
from .ranking import bigram_lm, doc_logprob_bigram, pmi_pairs, zipf_report
from .dedup import dedup_report, duplicate_source_matrix
from .similarity import embedding_stats
from .graph import out_degrees, pagerank
from .scd import scd2_as_of, scd2_current, scd2_merge
from .sampling import (
    assign_splits,
    cap_per_group,
    hash_sample,
    hash_uniform,
    resample_to_mix,
    stratified_sample,
    take_token_budget,
    top_per_group,
    weighted_sample,
)
from .text import (
    apply_quality_rules,
    chunk_documents,
    deterministic_shuffle,
    dup_ngram_fraction,
    gopher_rules,
    heavy_hitters,
    mix_report,
    scrub_pii,
    with_scrubbed_pii,
    fingerprint,
    language_id,
    normalize_text,
    quality_metrics,
    regex_token_count,
    repetition_metrics,
    token_count,
    vocab_coverage,
    char_entropy,
    with_quality_metrics,
)
from .dedup import (
    connected_components,
    dedup_keep_best,
    paragraph_dedup,
    dedup_against,
    near_dedup_against,
    near_dup_clusters,
    duplicate_clusters,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_containment_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash,
)
from .similarity import (
    brute_force_topk,
    cap_drop_stats,
    semantic_dedup,
    semantic_near_dup_pairs,
    cosine_similarity,
    cosine_scored_pairs,
    embedding_near_dup_pairs,
    fit_centroids,
    ivf_centroids,
    ivf_topk,
    group_centroids,
    project_embeddings,
    rp_lsh_topk,
)
from .asof import asof_join
from .timeseries import (
    interval_join,
    range_join_bands,
    rolling_aggregates,
    session_summary,
    sessionize,
    time_bucket,
    time_bucket_rollup,
)
from .features import approx_group_quantiles, group_quantiles, mad_outliers, pivot_counts, rank_normalize, winsorize
from .profile import profile
from .semistructured import extract_json_fields
from .ranking import sparse_cosine_pairs
from .fuzzy import deletion_variants, fuzzy_dedup_pairs, fuzzy_join_levenshtein
from .sketches import bloom_prune, cms_counts, hll_distinct, kmv_distinct, kmv_overlap
from .similarity import quantize_embeddings
from .skew import heavy_keys, salted_join, with_salt
from .ranking import (
    bm25_score,
    doc_logprob,
    document_frequencies,
    term_frequencies,
    tfidf,
    unigram_lm,
)
from .decontam import contamination_flags, decontaminate
from .multimodal import (
    blob_metadata,
    decode_images,
    make_fake_image_blob,
    make_fake_video_blob,
    resize_images,
    sample_frame_indices,
    sample_frames,
    with_blob_metadata,
)

__all__ = [
    "heavy_keys",
    "extract_json_fields",
    "sparse_cosine_pairs",
    "rolling_aggregates",
    "group_quantiles",
    "pivot_counts",
    "winsorize",
    "deletion_variants",
    "fuzzy_dedup_pairs",
    "fuzzy_join_levenshtein",
    "bloom_prune",
    "cms_counts",
    "hll_distinct",
    "kmv_distinct",
    "kmv_overlap",
    "quantize_embeddings",
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
    "weighted_sample",
    "fingerprint", "language_id", "normalize_text", "quality_metrics",
    "regex_token_count",
    "repetition_metrics", "token_count", "with_quality_metrics",
    "duplicate_clusters", "exact_dedup", "minhash_lsh_pairs",
    "minhash_signatures", "ngram_jaccard_pairs", "ngram_containment_pairs", "shingles", "simhash",
    "brute_force_topk", "cosine_similarity", "embedding_near_dup_pairs",
    "rp_lsh_topk",
    "asof_join",
    "range_join_bands", "time_bucket", "time_bucket_rollup",
    "sessionize", "session_summary",
    "salted_join", "with_salt",
    "blob_metadata", "decode_images", "make_fake_image_blob",
    "sample_frame_indices", "with_blob_metadata",
    "paragraph_dedup", "dedup_keep_best", "interval_join", "profile",
    "approx_group_quantiles", "group_centroids", "vocab_coverage",
    "resize_images", "sample_frames", "make_fake_video_blob",
    "hashed_gram_counts", "importance_model", "importance_weights",
    "select_by_importance", "leakage_safe_splits",
    "length_batches", "padding_report",
    "winnow_fingerprints", "interleave_by_mix",
    "winnow_overlap_pairs", "repeat_upsample",
    "check_constraints", "psi_report",
    "zipf_report", "duplicate_source_matrix", "embedding_stats",
    "pagerank", "out_degrees",
    "scd2_merge", "scd2_current", "scd2_as_of",
    "pmi_pairs", "bigram_lm", "doc_logprob_bigram",
    "mad_outliers", "char_entropy", "dedup_report", "rank_normalize",
]
