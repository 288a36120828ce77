from guardian_for_apache_kafka_spark.operators.asof import asof_join
from guardian_for_apache_kafka_spark.operators.backup import backup_batch, write_guardian_format
from guardian_for_apache_kafka_spark.operators.clusters import (
    connected_components,
    dedup_clusters,
)
from guardian_for_apache_kafka_spark.operators.compaction import compact_latest_by_key
from guardian_for_apache_kafka_spark.operators.dedup import (
    dedup_exact,
    dedup_minhash_lsh,
    embedding_near_dup_pairs,
    minhash_lsh_candidates,
    minhash_verified_dedup,
    ngram_containment_pairs,
    ngram_jaccard_pairs,
    semantic_dedup,
    simhash_pairs,
)
from guardian_for_apache_kafka_spark.operators.layout import spread_narrow_scan
from guardian_for_apache_kafka_spark.operators.maintenance import (
    compact_archive_slices,
    describe_archive,
)
from guardian_for_apache_kafka_spark.operators.multimodal import (
    attach_media,
    extract_audio_features,
    extract_image_features,
    frame_sample_plan,
    resize_images,
)
from guardian_for_apache_kafka_spark.operators.restore import (
    audit_archive,
    instance_roots,
    list_backup_keys,
    prune_keys_from_when,
    read_backup_jsonl,
    read_guardian_files,
    restore_batch,
    restore_to_producer_records,
    scan_corrupt_files,
)
from guardian_for_apache_kafka_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)
from guardian_for_apache_kafka_spark.operators.sampling import (
    deterministic_sample,
    deterministic_stratified_sample,
    split,
    split_label,
    stratified_sample,
)
from guardian_for_apache_kafka_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    kmeans_assign,
    knn_classify,
    quantize_embeddings,
    quantized_cosine_topk,
)
from guardian_for_apache_kafka_spark.operators.text import (
    fingerprint,
    language_id,
    quality_filter,
    quality_score,
    repetition_stats,
    token_stats,
)
from guardian_for_apache_kafka_spark.operators.timeseries import (
    activity_profile,
    correlated_pairs,
    profile_vectors,
)

__all__ = [
    "activity_profile",
    "asof_join",
    "attach_media",
    "audit_archive",
    "backup_batch",
    "compact_archive_slices",
    "compact_latest_by_key",
    "connected_components",
    "correlated_pairs",
    "cosine_topk",
    "dedup_clusters",
    "dedup_exact",
    "dedup_minhash_lsh",
    "describe_archive",
    "deterministic_sample",
    "deterministic_stratified_sample",
    "embedding_near_dup_pairs",
    "extract_audio_features",
    "extract_image_features",
    "fingerprint",
    "frame_sample_plan",
    "instance_roots",
    "ivf_topk",
    "kmeans_assign",
    "knn_classify",
    "language_id",
    "list_backup_keys",
    "minhash_lsh_candidates",
    "minhash_verified_dedup",
    "ngram_containment_pairs",
    "ngram_jaccard_pairs",
    "pack_sequences",
    "packing_stats",
    "profile_vectors",
    "prune_keys_from_when",
    "quality_filter",
    "quality_score",
    "quantize_embeddings",
    "quantized_cosine_topk",
    "read_backup_jsonl",
    "read_guardian_files",
    "repetition_stats",
    "resize_images",
    "restore_batch",
    "restore_to_producer_records",
    "scan_corrupt_files",
    "semantic_dedup",
    "simhash_pairs",
    "split",
    "split_label",
    "spread_narrow_scan",
    "stratified_sample",
    "token_stats",
    "write_guardian_format",
]
