"""Engine-level Ray Data workarounds.

``Dataset.join`` in Ray 2.49 emits a ZERO-COLUMN empty block for every
hash partition that received no rows. Such blocks survive map_batches
(empty blocks skip the UDF), sort and repartition, and crash any
downstream ``Dataset.join`` with ``ArrowInvalid: No match or multiple
matches for key field reference`` — and an unmaterialized join chained
into another join can deadlock the streaming executor.  ``safe_join``
therefore materializes each join's output and drops empty blocks by
METADATA ONLY (no data moves; block refs stay in the object store).
"""

from __future__ import annotations

import ray
import ray.data


@ray.remote(num_cpus=0.25)
def _as_arrow(block):
    import pyarrow as pa

    if isinstance(block, pa.Table):
        return block
    from ray.data.block import BlockAccessor

    return BlockAccessor.for_block(block).to_arrow()


def scrub_empty_blocks(ds):
    """Materialize ``ds`` and drop zero-row blocks.

    Fast path: when no block is empty the materialized dataset is
    returned untouched.  Otherwise the surviving blocks are re-wrapped
    via ``from_arrow_refs`` (converting any pandas blocks to arrow with
    tiny remote tasks — data never lands on the driver)."""
    mat = ds.materialize()
    items = [
        (ref, meta)
        for bundle in mat.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
    ]
    if all(meta.num_rows for _, meta in items):
        return mat
    refs = [ref for ref, meta in items if meta.num_rows]
    if not refs:
        return mat
    return ray.data.from_arrow_refs([_as_arrow.remote(r) for r in refs])


def safe_join(left, right, join_type: str, num_partitions: int, on, **kwargs):
    """``left.join(right, ...)`` with empty-block scrubbing on BOTH
    inputs (empty blocks skip map UDFs, so schema coercions upstream
    never see them — they must be dropped at the join boundary)."""
    return scrub_empty_blocks(left).join(
        scrub_empty_blocks(right), join_type=join_type,
        num_partitions=num_partitions, on=on, **kwargs)
