"""Ray-Data-native entity-resolution / record-linkage engine over Parquet
transcript tables.

A from-scratch rebuild (NOT a port) of the behavior of the reference AML
entity-resolution PoC (see /root/reference, JakubGorgon/AML-entity-resolution-
assignment): text normalization, blocking (exact keys + MinHash-LSH banding),
pairwise similarity scoring (Jaro-Winkler / Levenshtein / OSA + model
probability + rule cascade), transitive clustering via distributed
connected components, and pairwise precision/recall evaluation — all
expressed as ``ray.data.Dataset`` pipelines: ``map_batches`` over zero-copy
Arrow/pandas batches, actor pools for stateful scoring, groupby/sort
shuffles for the wide steps, and iterative aggregate rounds for union-find.

The unit of identity is a *conversation* (``conv_id``) in a transcript table
``(conv_id, turn_idx, role, text, tool, ts)``; it plays the role of the
reference's client record (reference: generation.py:235 ``record_id``).
"""

__version__ = "0.1.0"

import logging as _logging

# The driver-generated testdata parquet carries pandas schema metadata;
# Ray's unify_schemas tries hash(schema) on it and logs a benign
# "Failed to hash the schemas (for deduplication): unhashable type:
# 'dict'" warning PER BLOCK (its guarded fallback path is correct, just
# noisy).  Scope-silence exactly that logger; this runs in every Ray
# worker too, because workers import this package when deserializing
# the engine's UDFs.  ray.data must be imported FIRST: its dictConfig
# resets child loggers of "ray.data", wiping a level set before it
# (every consumer of this package imports ray.data anyway).
try:
    import ray.data as _rd  # noqa: F401
except Exception:  # pragma: no cover - ray always present in this env
    pass
_logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).setLevel(_logging.ERROR)

from .config import EngineConfig  # noqa: F401
