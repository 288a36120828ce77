"""North-star training-data-pipeline queries (dedup/similarity/text/multimodal)."""
