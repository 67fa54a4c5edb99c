"""Large-scale training-data operations beyond the reference's ER core:
deduplication (exact / MinHash / SimHash / n-gram / embedding /
SemDeDup / incremental), similarity search (brute + IVF ANN, int8
quantization), text analysis (quality, LID, BPE counting AND training,
LM scoring, chunking, contamination), relational extensions (as-of /
range / anti / semi joins, windows, quantiles, ROLLUP, pivot, diff),
sketches (KMV distinct/overlap), sampling/packing, and multimodal
plumbing with real BMP/PPM/PNG/WAV/Y4M codecs."""
