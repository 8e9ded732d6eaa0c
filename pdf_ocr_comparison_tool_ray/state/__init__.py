"""Checkpoint/resume, partition lineage, and run metrics."""
