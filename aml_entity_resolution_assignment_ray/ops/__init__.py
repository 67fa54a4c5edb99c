"""Large-scale training-data operations beyond the reference's ER core:
deduplication, similarity search, text analysis, multimodal plumbing."""
