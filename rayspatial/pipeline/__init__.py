"""Ray Data pipelines: pages synthesis, point extraction, spatial join,
tiling, kNN, dedup, checkpointing."""
