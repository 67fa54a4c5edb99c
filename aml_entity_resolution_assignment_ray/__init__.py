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

from .config import EngineConfig  # noqa: F401
