"""Text-format source/sink round-trips (sources/files.py)."""

import numpy as np
import pandas as pd


HOSTILE = ["plain", "comma,inside", 'quote"inside', "new\nline",
           "tab\tsep", "unicode ✓é"]


def test_jsonl_roundtrip_hostile_strings(ray_session, tmp_path):
    """JSONL preserves every string exactly (quotes, newlines,
    unicode), plus the empty-vs-null distinction."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.sources import files as f

    df = pd.DataFrame({"i": np.arange(8, dtype=np.int64),
                       "s": HOSTILE + ["", None]})
    d = str(tmp_path / "j")
    f.export_jsonl(rd.from_pandas(df).repartition(3), d)
    back = f.read_jsonl(d).to_pandas().sort_values("i").reset_index(drop=True)
    assert back["s"].tolist()[:7] == HOSTILE + [""]
    assert back["s"].iloc[7] is None or pd.isna(back["s"].iloc[7])

    # DuckDB parses the same files identically (the oracle contract)
    import duckdb
    got = [r[0] for r in duckdb.sql(
        f"SELECT s FROM read_json_auto('{d}/*.json') ORDER BY i").fetchall()]
    assert got[:7] == HOSTILE + [""]


def test_csv_roundtrip_and_null_caveat(ray_session, tmp_path):
    """CSV preserves quoted/escaped content but collapses the
    null-vs-empty distinction (why the CSV queries only export
    non-null key columns)."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.sources import files as f

    df = pd.DataFrame({"i": np.arange(6, dtype=np.int64), "s": HOSTILE})
    d = str(tmp_path / "c")
    f.export_csv(rd.from_pandas(df).repartition(2), d)
    back = f.read_csv(d).to_pandas().sort_values("i").reset_index(drop=True)
    assert back["s"].tolist() == HOSTILE

    import duckdb
    got = [r[0] for r in duckdb.sql(
        f"SELECT s FROM read_csv_auto('{d}/*.csv') ORDER BY i").fetchall()]
    assert got == HOSTILE


def test_partitioned_parquet_pruned_read(ray_session, tmp_path):
    """Single-partition reads restore the partition column and see
    only that partition's rows."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.sources import files as f

    df = pd.DataFrame({"k": ["a", "b"] * 10,
                       "v": np.arange(20, dtype=np.int64)})
    d = str(tmp_path / "p")
    f.export_partitioned_parquet(rd.from_pandas(df).repartition(4), d,
                                 partition_cols=["k"])
    a = f.read_partition(d, "k", "a").to_pandas()
    assert set(a["k"]) == {"a"} and len(a) == 10
    assert sorted(a["v"].tolist()) == list(range(0, 20, 2))


def test_read_jsonl_lines_quarantine(ray_session, tmp_path):
    """Raw-text JSONL parse drops unparseable / non-object /
    missing-field lines and keeps the rest — the behavior a native
    reader cannot give (it rejects the whole file)."""
    from aml_entity_resolution_assignment_ray.sources import files as f

    p = tmp_path / "zone"
    p.mkdir()
    (p / "a.jsonl").write_text("\n".join([
        '{"k": "x", "v": 1}',
        'this is not json at all',
        '{"k": "y", "v": 2}',
        '[1, 2, 3]',
        '{"k": "z"}',
        '{"v": 9, "k": "w", "extra": true}',
        '{"truncated": ',
    ]) + "\n")
    got = f.read_jsonl_lines(str(p), {"k": "str", "v": "int64"}) \
        .to_pandas().sort_values("v").reset_index(drop=True)
    assert got["k"].tolist() == ["x", "y", "w"]
    assert got["v"].tolist() == [1, 2, 9]
    assert got["v"].dtype == np.int64


def test_range_bucket_partitioned_roundtrip(ray_session, tmp_path):
    """Range buckets: (b_{i-1}, b_i] inclusive-right semantics,
    boundary values land in their own bucket; a pruned single-bucket
    read sees exactly that range."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.sources import files as f

    df = pd.DataFrame({
        "id": np.arange(9, dtype=np.int64),
        "v": np.array([0, 10, 11, 20, 25, 30, 31, 99, 10],
                      dtype=np.int64),
    })
    tagged = f.range_bucket(rd.from_pandas(df).repartition(3),
                            col="v", boundaries=[10, 30])
    out = tagged.to_pandas().sort_values("id")
    #  v<=10 -> 0, 10<v<=30 -> 1, v>30 -> 2
    assert out["bucket"].tolist() == [0, 0, 1, 1, 1, 1, 2, 2, 0]
    d = str(tmp_path / "rp")
    f.export_partitioned_parquet(tagged, d, partition_cols=["bucket"])
    mid = f.read_partition(d, "bucket", 1).to_pandas()
    assert sorted(mid["v"].tolist()) == [11, 20, 25, 30]


def test_union_by_name(ray_session):
    """Schema-evolution union: missing columns null-fill with the
    right dtype, output schema is the first-appearance union, row
    content survives from every generation."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.sources import files as f

    a = pd.DataFrame({"id": np.array([1, 2], dtype=np.int64),
                      "x": ["a", "b"]})
    b = pd.DataFrame({"id": np.array([3], dtype=np.int64),
                      "x": ["c"],
                      "v": np.array([70], dtype=np.int64)})
    c = pd.DataFrame({"id": np.array([4], dtype=np.int64),
                      "v": np.array([80], dtype=np.int64),
                      "w": np.array([0.5])})
    u = f.union_by_name([rd.from_pandas(a), rd.from_pandas(b),
                         rd.from_pandas(c)]).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert list(u.columns) == ["id", "x", "v", "w"]
    assert u["id"].tolist() == [1, 2, 3, 4]
    assert u["x"].tolist()[:3] == ["a", "b", "c"] and u["x"].isna()[3]
    assert u["v"].isna().tolist() == [True, True, False, False]
    assert int(u["v"].dropna().sum()) == 150
    assert np.isnan(u["w"][0]) and u["w"][3] == 0.5
