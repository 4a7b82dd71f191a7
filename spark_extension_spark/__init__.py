"""spark_extension_spark — a PySpark-native engine with the query and
data-processing capabilities of G-Research/spark-extension, re-expressed
Spark-first (DataFrame/SQL/Catalyst), plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal).

Everything is a ``DataFrame -> DataFrame`` transformation built from
stock ``pyspark.sql`` primitives; no custom JVM code, no Py4J reach-ins.
"""

from .utils import (
    backticks,
    count_null,
    distinct_prefix_for,
    UnpersistHandle,
    SilentUnpersistHandle,
    NoopUnpersistHandle,
)
from .operators import (
    bm25_score,
    contamination_flags,
    decontaminate,
    dup_ngram_fraction,
    heavy_hitters,
    resample_to_mix,
    semantic_dedup,
    semantic_near_dup_pairs,
    tfidf,
    DiffComparator,
    DiffComparators,
    DiffMode,
    DiffOptions,
    Differ,
    diff,
    diff_with,
    histogram,
    with_row_numbers,
    SortedGroupByDataFrame,
    group_by_sorted,
    group_by_key_sorted,
    KeySortedGroups,
    deterministic_shuffle,
    scrub_pii,
    with_scrubbed_pii,
    pack_blocks,
    with_running_total,
    assign_splits,
    hash_sample,
    hash_uniform,
    stratified_sample,
    fingerprint,
    language_id,
    normalize_text,
    quality_metrics,
    regex_token_count,
    repetition_metrics,
    token_count,
    with_quality_metrics,
    duplicate_clusters,
    exact_dedup,
    minhash_lsh_pairs,
    connected_components,
    near_dup_clusters,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash,
    brute_force_topk,
    cosine_similarity,
    embedding_near_dup_pairs,
    rp_lsh_topk,
    asof_join,
    range_join_bands,
    sessionize,
    session_summary,
    time_bucket,
    time_bucket_rollup,
    salted_join,
    with_salt,
    blob_metadata,
    decode_images,
    make_fake_image_blob,
    sample_frame_indices,
    with_blob_metadata,
)
from .sources import (
    parquet_block_columns,
    parquet_blocks,
    parquet_metadata,
    parquet_partitions,
    parquet_schema,
    write_partitioned_by,
    write_bucketed,
    read_bucketed,
    colocated_join,
)
from .patch import install, uninstall
from .version import spark_version, spark_version_at_least
from .operators.sorted_groups import group_by_key
from .session import (
    append_job_description,
    create_temporary_dir,
    install_pip_package,
    install_poetry_project,
    job_description,
    on_either,
    when_then,
)
from .functions import (
    dotnet_ticks_to_timestamp,
    dotnet_ticks_to_unix_epoch,
    dotnet_ticks_to_unix_epoch_nanos,
    timestamp_to_dotnet_ticks,
    unix_epoch_to_dotnet_ticks,
    unix_epoch_nanos_to_dotnet_ticks,
)

__version__ = "0.1.0"
