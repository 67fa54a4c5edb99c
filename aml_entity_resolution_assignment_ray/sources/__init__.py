"""Sources & sinks: Parquet IO helpers and the seeded synthetic
transcript-corpus generator used by tests and benchmarks."""
