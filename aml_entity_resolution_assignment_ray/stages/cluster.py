"""Transitive clustering: match edges -> connected components, distributed.

The reference collects all match edges into a driver-memory
``networkx.Graph`` and labels components ``ENT_{i}``
(reference matching.py:572-596).  That cannot work at 10^12-turn scale,
so this stage runs **min-label propagation** (hash-to-min; cf. the
log-rounds MapReduce connected-components construction, PAPERS.md
"Finding connected components in map-reduce", ICDE 2013) as iterative
Ray Data aggregate rounds:

* labels start as ``label[v] = v`` for EVERY conv_id — singletons are
  preserved exactly as the reference's ``G.add_nodes_from(all)`` does
  (matching.py:580);
* each round: propagate labels across edges (both directions) and take
  the per-node min — ``edges ⋈ labels`` (hash join on node) followed by
  ``groupby(node).min(label)``;
* stop at fixpoint, detected by a cheap per-round label checksum (an
  aggregate, no extra shuffle) — min-propagation is monotone, so an
  unchanged checksum means converged;
* the final label (the component's lexicographically smallest conv_id)
  becomes ``predicted_entity_id = "ENT_" + label`` — equal to the
  reference's ``ENT_{i}`` numbering up to a bijective renaming, which is
  all pairwise evaluation needs.

Every round materializes its label Dataset, keeping lineage O(1) per
round and making each round a natural checkpoint boundary (north_rule:
"union-find forests" checkpointed per partition).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, EngineConfig
from ..util import safe_join

MAX_ROUNDS = 25


def _bidir(edges):
    """(id_a, id_b) match edges -> both-direction (src, dst) Dataset."""

    def both(t: pa.Table) -> pa.Table:
        a, b = t["id_a"], t["id_b"]
        return pa.table({
            "src": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
            "dst": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()]),
        })

    return edges.map_batches(both, batch_format="pyarrow")


def _label_checksum(labels) -> int:
    """Order-independent uint64 checksum of (node, label) rows."""

    def crc_batch(df: pd.DataFrame) -> pd.DataFrame:
        h = np.fromiter(
            (zlib.crc32((a + "\x00" + b).encode()) for a, b in
             zip(df["node"].astype(str), df["label"].astype(str))),
            count=len(df), dtype=np.uint64,
        )
        return pd.DataFrame({"h": h})

    return int(labels.map_batches(crc_batch, batch_format="pandas").sum("h"))


def connected_components(edges, all_nodes, cfg: EngineConfig = DEFAULT_CONFIG,
                         max_rounds: int = MAX_ROUNDS):
    """edges (id_a, id_b) + all_nodes (conv_id) -> labels Dataset
    ``(node, label)`` where label = min conv_id of the component."""
    labels = all_nodes.map_batches(
        lambda t: pa.table({"node": t["conv_id"], "label": t["conv_id"]}),
        batch_format="pyarrow",
    ).materialize()
    edges_bd = _bidir(edges).materialize()
    if edges_bd.count() == 0:
        return labels

    nparts = cfg.resolve_join_partitions()
    prev_sum = _label_checksum(labels)
    for _ in range(max_rounds):
        # neighbor labels: edges(src,dst) ⋈ labels(node=src) -> (dst, label)
        prop = safe_join(
            edges_bd, labels.rename_columns({"node": "src"}),
            join_type="inner", num_partitions=nparts, on=("src",),
        ).select_columns(["dst", "label"]).rename_columns({"dst": "node"})
        merged = labels.union(prop)
        new_labels = (
            merged.groupby("node").min("label")
            .rename_columns({"min(label)": "label"})
            .materialize()
        )
        new_sum = _label_checksum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


def resolve_entities(classified, all_nodes, cfg: EngineConfig = DEFAULT_CONFIG):
    """classified pair Dataset -> predictions Dataset
    ``(conv_id, predicted_entity_id)`` (reference matching.py:572-596)."""
    edges = classified.filter(expr="is_match == 1").select_columns(["id_a", "id_b"])
    labels = connected_components(edges, all_nodes, cfg)

    def to_pred(t: pa.Table) -> pa.Table:
        ent = pc.binary_join_element_wise(
            pa.array(["ENT_"] * len(t)), pc.cast(t["label"], pa.string()), "")
        return pa.table({"conv_id": t["node"], "predicted_entity_id": ent})

    return labels.map_batches(to_pred, batch_format="pyarrow")
