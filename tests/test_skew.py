"""Hot-key skew handling tests (north_rule: explicit skew handling).

The engine's skew story for candidate generation (stages/pairs.py):
the range partitioner acts as the salt — a hot blocking key spans many
sorted blocks, its fragments are marked as block-edge groups, and the
side-path reassembly purges any group over ``max_block_records`` instead
of emitting its O(m^2) pairs (the reference only WARNS at >50 / >1000,
matching.py:71-73; at 10^12-turn scale purge-and-log is mandatory).
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


def test_hot_key_purged(ray_session):
    import ray.data as rd

    cfg = EngineConfig(max_block_records=100, join_num_partitions=4)
    keys = rd.from_arrow(_keys_table(hot_size=2000))
    pairs = generate_pairs(keys, cfg).to_pandas()
    # the hot key must contribute ZERO pairs (2000 > cap -> purged);
    # each normal group of 3 contributes C(3,2)=3
    assert not pairs["id_a"].str.startswith("h").any()
    assert len(pairs) == 20 * 3

    stats = blocking_stats(keys, total_records=2060, pairs_count=len(pairs),
                           cfg=cfg)
    assert stats["oversized_blocks"] == 1
    assert stats["oversized_rows_purged"] == 2000
    top = [t for t in stats["top_blocks"] if t["key_type"] == "email"]
    assert top and top[0]["cnt"] == 2000


def test_cap_boundary_inclusive(ray_session):
    """Groups of exactly max_block_records still emit pairs."""
    import ray.data as rd

    cfg = EngineConfig(max_block_records=50, join_num_partitions=4)
    keys = rd.from_arrow(_keys_table(hot_size=50, normal_groups=2))
    pairs = generate_pairs(keys, cfg).to_pandas()
    hot_pairs = pairs[pairs["id_a"].str.startswith("h")]
    assert len(hot_pairs) == 50 * 49 // 2
