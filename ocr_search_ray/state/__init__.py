"""Checkpoint manifest: per-partition lineage + metrics, resume support."""
