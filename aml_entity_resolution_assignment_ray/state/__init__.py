"""Checkpoint / lineage state management (north_rule: resumable runs)."""
