"""Ray Data operator stages: map_batches wrappers and actor classes."""
