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
    ngram_jaccard_pairs,
    simhash_pairs,
)
from guardian_for_apache_kafka_spark.operators.maintenance import compact_archive_slices
from guardian_for_apache_kafka_spark.operators.multimodal import (
    attach_media,
    extract_audio_features,
    extract_image_features,
    frame_sample_plan,
    resize_images,
)
from guardian_for_apache_kafka_spark.operators.restore import (
    list_backup_keys,
    prune_keys_from_when,
    read_backup_jsonl,
    read_guardian_files,
    restore_batch,
    restore_to_producer_records,
)
from guardian_for_apache_kafka_spark.operators.sampling import (
    deterministic_sample,
    split,
    stratified_sample,
)
from guardian_for_apache_kafka_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    quantize_embeddings,
    quantized_cosine_topk,
)
from guardian_for_apache_kafka_spark.operators.text import (
    fingerprint,
    language_id,
    quality_score,
    token_stats,
)

__all__ = [
    "asof_join",
    "attach_media",
    "backup_batch",
    "compact_archive_slices",
    "compact_latest_by_key",
    "connected_components",
    "cosine_topk",
    "dedup_clusters",
    "dedup_exact",
    "dedup_minhash_lsh",
    "deterministic_sample",
    "embedding_near_dup_pairs",
    "extract_audio_features",
    "extract_image_features",
    "fingerprint",
    "frame_sample_plan",
    "ivf_topk",
    "language_id",
    "list_backup_keys",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "prune_keys_from_when",
    "quality_score",
    "quantize_embeddings",
    "quantized_cosine_topk",
    "read_backup_jsonl",
    "read_guardian_files",
    "resize_images",
    "restore_batch",
    "restore_to_producer_records",
    "simhash_pairs",
    "split",
    "stratified_sample",
    "token_stats",
    "write_guardian_format",
]
