"""Engine-level Ray Data workarounds.

``Dataset.join`` in Ray 2.49 emits a ZERO-COLUMN empty block for every
hash partition that received no rows. Such blocks survive map_batches
(empty blocks skip the UDF), sort and repartition, and crash any
downstream ``Dataset.join`` with ``ArrowInvalid: No match or multiple
matches for key field reference`` — and an unmaterialized join chained
into another join can deadlock the streaming executor.  ``safe_join``
therefore materializes each join's output and drops empty blocks by
METADATA ONLY (no data moves; block refs stay in the object store).

Barrier cost note: the scrub's materialize is a pipeline barrier only
when the join input is still lazy.  In the hot paths it is not — the
flagship materializes profiles/pairs/classified at stage boundaries
anyway (they are also the checkpoint units), CC rounds materialize
label tables by design, and the scrub's fast path returns an
already-materialized dataset untouched.  The remaining lazy-input
scrubs (dedup verify join mode, training hydration) trade one
output-sized barrier for immunity to the empty-block crash — revisit
when the upstream Ray bug is fixed.
"""

from __future__ import annotations

import ray
import ray.data


def tune_context(nparts: int | None = None):
    """Engine-wide DataContext setup (idempotent).

    * ``HASH_SHUFFLE`` strategy — required for ``repartition(keys=...)``,
      the primitive pair generation and assembly are built on;
    * aggregator actors sized at 0.25 CPU per partition so a shuffle's
      aggregator pool never starves the map tasks feeding it;
    * optional ``nparts``: data-driven parallelism floor for small
      inputs (the 200-way defaults drown test-scale data in per-task
      overhead).
    """
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # aggregator pools default to 0.0625 CPU per partition — small enough
    # that chained shuffles never starve the map tasks feeding them
    if nparts is not None:
        import os

        ctx.min_parallelism = nparts
        ctx.default_hash_shuffle_parallelism = nparts
        ctx.read_op_min_num_blocks = nparts
        # every hash shuffle (repartition/join) costs ~0.1s of fixed
        # per-partition overhead in Ray 2.49 — the engine's own
        # partition counts must follow the same data-driven knob
        if not os.environ.get("ER_JOIN_NUM_PARTITIONS"):
            os.environ["ER_JOIN_NUM_PARTITIONS"] = str(nparts)
    return ctx


@ray.remote(num_cpus=0.25)
def _as_arrow(block):
    import pyarrow as pa

    if isinstance(block, pa.Table):
        return block
    from ray.data.block import BlockAccessor

    return BlockAccessor.for_block(block).to_arrow()


def scrub_empty_blocks(ds, empty_schema=None):
    """Materialize ``ds`` and drop zero-row blocks.

    Fast path: when no block is empty the materialized dataset is
    returned untouched.  Otherwise the surviving blocks are re-wrapped
    via ``from_arrow_refs`` (converting any pandas blocks to arrow with
    tiny remote tasks — data never lands on the driver).

    ``empty_schema``: when EVERY block is empty (a dataset of only
    zero-column poison blocks — e.g. a pair table with no candidates),
    return a clean empty dataset with this pyarrow schema instead, so
    downstream joins see real columns.

    Lineage tag: the returned dataset is marked ``_er_scrubbed``; a
    dataset that already carries the mark (e.g. a safe_join output fed
    straight into another safe_join) is returned untouched — the
    second scrub's materialize/metadata walk is skipped entirely.  Any
    TRANSFORM of a scrubbed dataset yields a new object without the
    mark, so the tag can never leak past an operation that could
    reintroduce empty blocks."""
    if getattr(ds, "_er_scrubbed", False):
        return ds
    mat = ds.materialize()
    items = [
        (ref, meta)
        for bundle in mat.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
    ]
    if items and all(meta.num_rows for _, meta in items):
        mat._er_scrubbed = True
        return mat
    refs = [ref for ref, meta in items if meta.num_rows]
    if not refs:
        if empty_schema is not None:
            out = ray.data.from_arrow(empty_schema.empty_table())
            out._er_scrubbed = True
            return out
        # all-empty with no replacement schema: the poison blocks are
        # still in there — deliberately NOT tagged clean
        return mat
    out = ray.data.from_arrow_refs([_as_arrow.remote(r) for r in refs])
    out._er_scrubbed = True
    return out


# --------------------------------------------------------------------------
# stateful task maps
# --------------------------------------------------------------------------
#
# Measured on this Ray version: an actor-pool map_batches over 1.7M pairs
# took 25-34s wall regardless of pool size (dispatch serializes), while
# the identical kernel as plain TASKS took 5-8s.  Stateful stages
# therefore run as tasks with their state built ONCE PER WORKER PROCESS
# (workers are reused across tasks, so this keeps the once-per-actor
# init property: model load / broadcast fetch happen once per process,
# not once per batch).

_WORKER_STATE: dict = {}


def stateful_map_fn(cls, args, cache_key: str):
    """A map_batches-compatible function that lazily constructs
    ``cls(*args)`` once per worker process (keyed by ``cache_key``,
    unique per stage instance) and delegates batches to it."""

    def fn(batch):
        inst = _WORKER_STATE.get(cache_key)
        if inst is None:
            if len(_WORKER_STATE) > 4:   # bound per-worker state memory
                _WORKER_STATE.clear()
            inst = cls(*args)
            _WORKER_STATE[cache_key] = inst
        return inst(batch)

    return fn


def stateful_map(ds, cls, args, **map_kwargs):
    """``ds.map_batches`` over a stateful kernel class, as TASKS with
    once-per-worker-process construction (see module comment)."""
    import uuid

    key = f"{cls.__name__}-{uuid.uuid4().hex}"
    map_kwargs.pop("concurrency", None)
    return ds.map_batches(stateful_map_fn(cls, tuple(args), key), **map_kwargs)


def _empty_like(mat):
    """0-row dataset with ``mat``'s schema (arrow or pandas blocks)."""
    import pandas as pd
    import pyarrow as pa

    s = mat.schema(fetch_if_missing=True)
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return ray.data.from_arrow(base.empty_table())
    names = list(getattr(s, "names", []) or [])
    return ray.data.from_pandas(pd.DataFrame(columns=names))


def safe_join(left, right, join_type: str, num_partitions: int, on,
              empty_left_schema=None, empty_right_schema=None, **kwargs):
    """``left.join(right, ...)`` with empty-block scrubbing on BOTH
    inputs (empty blocks skip map UDFs, so schema coercions upstream
    never see them — they must be dropped at the join boundary).

    Empty-side short circuits (Ray 2.49's hash-shuffle join crashes on a
    0-row input even when its block carries a schema — the internal
    shuffle re-emits zero-column partitions):

    * inner with either side empty -> 0 rows with the LEFT schema (the
      right-side columns never materialize; every in-repo consumer of an
      empty inner join only counts / coerces it);
    * left_outer with empty right -> the left rows unchanged (no marker
      columns; ``anti_join_pairs``'s null filter treats their absence as
      "nothing matched").
    """
    lmat = scrub_empty_blocks(left, empty_left_schema)
    rmat = scrub_empty_blocks(right, empty_right_schema)
    ln, rn = lmat.count(), rmat.count()  # metadata-only on materialized
    if ln == 0:
        return lmat if join_type in ("inner", "left_outer") else lmat
    if rn == 0:
        if join_type == "inner":
            return _empty_like(lmat)
        if join_type == "left_outer":
            return lmat
    return lmat.join(rmat, join_type=join_type,
                     num_partitions=num_partitions, on=on, **kwargs)


def round_half_away(x, decimals: int = 0):
    """Half-away-from-zero rounding — DuckDB ``round()`` tie behavior
    (pandas/numpy .round are half-to-even and diverge on exact .5).
    Shared by the driver-contract finalizers and any op that must
    round BEFORE a ranking/filter decision so both sides of a SQL
    oracle decide boundaries on identical values."""
    import numpy as np

    f = 10.0 ** decimals
    v = np.asarray(x, dtype=np.float64) * f
    return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)) / f
