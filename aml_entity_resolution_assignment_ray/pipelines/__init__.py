"""End-to-end pipelines composing the stages (SURVEY §7.1)."""
