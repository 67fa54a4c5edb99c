"""Hot-key skew handling tests (north_rule: explicit skew handling).

The engine's skew story for candidate generation (stages/pairs.py):

* default (``cfg.salt_pairs`` ON) — hot key groups over
  ``salt_min_group`` split into sorted sub-chunks re-shuffled as
  triangle cells (the explicit SALTED repartition), spreading one hot
  key's O(m^2) emission over ~c^2/2 tasks with ZERO recall loss (the
  reference never purges, it only warns at >50 / >1000,
  matching.py:71-73); only degenerate groups over ``hard_block_cap``
  are purged;
* with salting OFF, any group over ``max_block_records`` is purged,
  and purges are surfaced by ``blocking_stats``.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from aml_entity_resolution_assignment_ray.config import EngineConfig
from aml_entity_resolution_assignment_ray.stages.block import blocking_stats
from aml_entity_resolution_assignment_ray.stages.pairs import generate_pairs


def _keys_table(hot_size: int, normal_groups: int = 20):
    rows = []
    # one pathologically hot key
    for i in range(hot_size):
        rows.append(("email", "hot@example.com", f"h{i:06d}"))
    # normal small groups of 3
    for g in range(normal_groups):
        for m in range(3):
            rows.append(("nid", f"key{g:04d}", f"n{g:04d}_{m}"))
    return pa.table({
        "key_type": pa.array([r[0] for r in rows]),
        "key_value": pa.array([r[1] for r in rows]),
        "conv_id": pa.array([r[2] for r in rows]),
    })


def test_hot_key_purged_when_salting_off(ray_session):
    import ray.data as rd

    cfg = EngineConfig(max_block_records=100, join_num_partitions=4,
                       salt_pairs=False)
    keys = rd.from_arrow(_keys_table(hot_size=2000))
    pairs = generate_pairs(keys, cfg).to_pandas()
    # the hot key must contribute ZERO pairs (2000 > cap -> purged);
    # each normal group of 3 contributes C(3,2)=3
    assert not pairs["id_a"].str.startswith("h").any()
    assert len(pairs) == 20 * 3

    stats = blocking_stats(keys, total_records=2060, pairs_count=len(pairs),
                           cfg=cfg)
    assert stats["oversized_blocks"] == 1
    assert stats["oversized_rows"] == 2000
    assert stats["purged_blocks"] == 1
    assert stats["purged_rows"] == 2000
    top = [t for t in stats["top_blocks"] if t["key_type"] == "email"]
    assert top and top[0]["cnt"] == 2000


def test_hot_key_salted_by_default(ray_session):
    """The FLAGSHIP default (salt unset -> cfg.salt_pairs, ON): a group
    over max_block_records emits ALL its pairs via the salted cells —
    no recall loss — and blocking_stats reports it as oversized
    (monitor) but NOT purged."""
    import ray.data as rd

    cfg = EngineConfig(max_block_records=100, salt_min_group=64,
                       join_num_partitions=4, gather_max_keys=0)
    keys_tbl = _keys_table(hot_size=300, normal_groups=5)
    pairs = generate_pairs(rd.from_arrow(keys_tbl), cfg).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert len(pairs) == len(got)
    assert got == _naive_pairs(keys_tbl)        # hot pairs all present
    assert len(got) == 300 * 299 // 2 + 5 * 3

    stats = blocking_stats(rd.from_arrow(keys_tbl), total_records=315,
                           pairs_count=len(pairs), cfg=cfg)
    assert stats["oversized_blocks"] == 1       # still monitored
    assert stats["purged_blocks"] == 0          # but nothing dropped
    assert stats["salted"] is True

    # gather path honors the same raised cap
    cfg_g = EngineConfig(max_block_records=100, salt_min_group=64,
                         join_num_partitions=4)
    pairs_g = generate_pairs(rd.from_arrow(keys_tbl), cfg_g,
                             n_rows=keys_tbl.num_rows).to_pandas()
    assert set(zip(pairs_g["id_a"], pairs_g["id_b"])) == got


def test_cap_boundary_inclusive(ray_session):
    """Groups of exactly max_block_records still emit pairs."""
    import ray.data as rd

    cfg = EngineConfig(max_block_records=50, join_num_partitions=4)
    keys = rd.from_arrow(_keys_table(hot_size=50, normal_groups=2))
    pairs = generate_pairs(keys, cfg).to_pandas()
    hot_pairs = pairs[pairs["id_a"].str.startswith("h")]
    assert len(hot_pairs) == 50 * 49 // 2


def _naive_pairs(keys_tbl: pa.table) -> set:
    df = keys_tbl.to_pandas()
    out = set()
    for _, g in df.groupby(["key_type", "key_value"]):
        ids = sorted(set(g["conv_id"]))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out.add((ids[i], ids[j]))
    return out


def _overlap_keys_table(hot_size: int):
    """One hot key + a cold key whose pairs OVERLAP the hot key's
    (cross-path duplicates must still come out globally distinct)."""
    rows = [("email", "hot@example.com", f"h{i:06d}") for i in range(hot_size)]
    rows += [("nid", "K1", "h000000"), ("nid", "K1", "h000001"),
             ("nid", "K1", "zzz_only_cold")]
    rows += [("phone", f"p{g}", f"c{g}_{m}") for g in range(10)
             for m in range(3)]
    return pa.table({
        "key_type": pa.array([r[0] for r in rows]),
        "key_value": pa.array([r[1] for r in rows]),
        "conv_id": pa.array([r[2] for r in rows]),
    })


@pytest.mark.parametrize("plan", ["routed", "legacy", "gather"])
def test_salted_pairs_exact(ray_session, plan):
    """salt=True emits EXACTLY the naive distinct pair set — hot key
    split across cells, cold keys on the direct path, cross-path
    duplicate pairs deduped — on all three plans: the default ROUTED
    two-pass (broadcast hot set, one data shuffle), the LEGACY
    broadcast-free 3-shuffle fallback (forced by zeroing the broadcast
    gate), and the single-task gather."""
    import ray.data as rd

    keys_tbl = _overlap_keys_table(hot_size=700)
    cfg = EngineConfig(
        max_block_records=1 << 30, salt_min_group=64,
        join_num_partitions=4,
        gather_max_keys=500_000 if plan == "gather" else 0,
        broadcast_max_rows=0 if plan == "legacy" else 2_000_000)
    pairs = generate_pairs(rd.from_arrow(keys_tbl), cfg,
                           n_rows=keys_tbl.num_rows, salt=True).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert len(pairs) == len(got), "salted output contains duplicates"
    assert got == _naive_pairs(keys_tbl)
    assert (pairs["id_a"] < pairs["id_b"]).all()


def test_salted_respects_hard_cap(ray_session):
    """The safety valve holds under salting: a group over
    hard_block_cap emits nothing even on the salted path."""
    import ray.data as rd

    keys_tbl = _keys_table(hot_size=300, normal_groups=5)
    cfg = EngineConfig(max_block_records=100, hard_block_cap=100,
                       salt_min_group=64,
                       join_num_partitions=4, gather_max_keys=0)
    pairs = generate_pairs(rd.from_arrow(keys_tbl), cfg, salt=True).to_pandas()
    assert not pairs["id_a"].str.startswith("h").any()
    assert len(pairs) == 5 * 3
