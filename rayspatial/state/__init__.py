"""Stateful/externalized concerns: checkpoint manifests, lineage and
per-partition metrics for resumable runs."""
