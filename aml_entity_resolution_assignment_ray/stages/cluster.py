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
* each round: propagate labels across edges (both directions) AND
  pointer-jump through the label table itself (``labels ⋈ labels`` on
  ``label = node`` — label[v] <- label[label[v]]), then take the
  per-node min.  The edge step alone moves a label ONE hop per round
  (O(diameter) rounds — a long chain would exceed any fixed round
  budget); the jump step halves every label chain, so convergence is
  O(log diameter) rounds like the large-star/small-star constructions;
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
    """Order-independent uint64 checksum of (node, label) rows —
    vectorized ``pd.util.hash_array`` per column, mixed so the binding
    node<->label matters, summed with uint64 wraparound (no per-row
    Python: this runs over node-scale data every round)."""

    def crc_batch(df: pd.DataFrame) -> pd.DataFrame:
        hn = pd.util.hash_array(df["node"].to_numpy(dtype=object))
        hl = pd.util.hash_array(df["label"].to_numpy(dtype=object))
        with np.errstate(over="ignore"):
            h = (hn ^ np.uint64(0x9E3779B97F4A7C15)) \
                * np.uint64(0xBF58476D1CE4E5B9) + hl
        return pd.DataFrame({"h": h})

    return int(labels.map_batches(crc_batch, batch_format="pandas").sum("h"))


def _identity_labels(all_nodes):
    return all_nodes.map_batches(
        lambda t: pa.table({"node": t["conv_id"], "label": t["conv_id"]}),
        batch_format="pyarrow",
    ).materialize()


def _driver_union_find(edge_df: pd.DataFrame) -> dict:
    """Array DSU with path compression over a driver-small edge list."""
    codes_a, uniq = pd.factorize(
        pd.concat([edge_df["id_a"], edge_df["id_b"]], ignore_index=True))
    n_edges = len(edge_df)
    a, b = codes_a[:n_edges], codes_a[n_edges:]
    parent = np.arange(len(uniq), dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for i in range(n_edges):
        ra, rb = find(a[i]), find(b[i])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    names = np.asarray(uniq, dtype=object)
    # component label = lexicographically smallest member name
    roots = np.fromiter((find(i) for i in range(len(uniq))), dtype=np.int64,
                        count=len(uniq))
    label_of_root: dict[int, str] = {}
    order = np.argsort(names.astype(str))
    for i in order:
        r = roots[i]
        if r not in label_of_root:
            label_of_root[r] = names[i]
    return {names[i]: label_of_root[roots[i]] for i in range(len(uniq))}


def _apply_touched_labels(all_nodes, touched: dict):
    """all_nodes + {node: label} for edge-touched nodes -> full labels
    (untouched nodes label themselves). Broadcast via ray.put."""
    import ray

    ref = ray.put(touched)

    class Apply:
        def __init__(self, r):
            self.touched = ray.get(r)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            nodes = df["conv_id"]
            # Series.map(dict) is the vectorized dict-lookup path;
            # untouched nodes label themselves
            labels = nodes.map(self.touched).fillna(nodes)
            return pa.table({"node": pa.array(nodes, pa.string()),
                             "label": pa.array(labels, pa.string())})

    from ..util import stateful_map

    return stateful_map(all_nodes, Apply, (ref,),
                        batch_format="pandas").materialize()


def connected_components(edges, all_nodes, cfg: EngineConfig = DEFAULT_CONFIG,
                         max_rounds: int = MAX_ROUNDS):
    """edges (id_a, id_b) + all_nodes (conv_id) -> labels Dataset
    ``(node, label)`` where label = min conv_id of the component.

    Two paths (auto by edge count, like production CC implementations
    that finish the shrunken graph centrally):

    * driver DSU when the edge list fits comfortably on the driver
      (<= cfg.cc_driver_max_edges) — match graphs are vastly smaller
      than the input;
    * distributed min-label rounds otherwise, restricted to the nodes
      that appear in edges (singletons never enter a shuffle), with the
      final label map applied to all_nodes at the end.
    """
    edges_mat = edges.materialize()
    n_edges = edges_mat.count()
    if n_edges == 0:
        return _identity_labels(all_nodes)

    if n_edges <= cfg.cc_driver_max_edges:
        touched = _driver_union_find(edges_mat.to_pandas())
        return _apply_touched_labels(all_nodes, touched)

    # --- distributed path: only edge-touched nodes iterate ---
    edges_bd = _bidir(edges_mat).materialize()
    nparts = cfg.resolve_join_partitions()
    labels = (
        edges_bd.groupby("src").min("dst")
        .rename_columns({"src": "node", "min(dst)": "label"})
        .map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "label": pc.min_element_wise(t["node"], t["label"]),
            }), batch_format="pyarrow")
        .materialize()
    )
    from ..util import scrub_empty_blocks

    prev_sum = _label_checksum(labels)
    for _ in range(max_rounds):
        # NOTE empty join-output blocks skip the select/rename map UDFs
        # and would reach the groupby with raw join columns — scrub them
        # off both propagation branches first.
        prop = scrub_empty_blocks(
            safe_join(
                edges_bd, labels.rename_columns({"node": "src"}),
                join_type="inner", num_partitions=nparts, on=("src",),
            ),
            pa.schema([("src", pa.string()), ("dst", pa.string()),
                       ("label", pa.string())]),
        ).select_columns(["dst", "label"]).rename_columns({"dst": "node"})
        # pointer jumping: label[v] <- label[label[v]].  Every label is
        # itself an edge-touched node (labels are mins over node ids),
        # so the inner self-join is total.
        jump = scrub_empty_blocks(
            safe_join(
                labels.rename_columns({"label": "_mid"}),
                labels.rename_columns({"node": "_mid", "label": "_jlabel"}),
                join_type="inner", num_partitions=nparts, on=("_mid",),
            ),
            pa.schema([("node", pa.string()), ("_mid", pa.string()),
                       ("_jlabel", pa.string())]),
        ).select_columns(["node", "_jlabel"]) \
            .rename_columns({"_jlabel": "label"})
        merged = labels.union(prop).union(jump)
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

    # untouched singletons label themselves: left join all_nodes <- labels
    full = safe_join(
        all_nodes.map_batches(
            lambda t: pa.table({"node": t["conv_id"]}), batch_format="pyarrow"),
        labels, join_type="left_outer", num_partitions=nparts, on=("node",),
    )

    def fill(t: pa.Table) -> pa.Table:
        if "label" not in t.column_names or len(t) == 0:
            return pa.schema([("node", pa.string()),
                              ("label", pa.string())]).empty_table()
        lab = pc.coalesce(t["label"], t["node"])
        return pa.table({"node": t["node"], "label": lab})

    return full.map_batches(fill, batch_format="pyarrow")


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
