"""Relational operator tests: asof_join / range_join / group_topk /
grouped_quantiles / sliding_window_agg vs brute-force pandas oracles on
seeded random data (every op's semantics is deterministic, so exact
frame equality is asserted)."""

import numpy as np
import pandas as pd
import pytest

from aml_entity_resolution_assignment_ray.config import EngineConfig
from aml_entity_resolution_assignment_ray.ops.events import sliding_window_agg
from aml_entity_resolution_assignment_ray.ops.relational import (
    asof_join,
    grouped_quantiles,
    group_topk,
    range_join,
)

SHUFFLE_CFG = EngineConfig(gather_max_keys=0)     # force the keyed-shuffle path
GATHER_CFG = EngineConfig(gather_max_keys=10**6)  # force the gather path


def _events(n=300, n_users=12, seed=5):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, n_users, n).astype(np.int64),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
        "v": rng.rand(n).round(3),
    })


def _orders(n=80, n_users=12, seed=9):
    rng = np.random.RandomState(seed)
    # coarse timestamps so right-side ts TIES occur (the tie-break path)
    return pd.DataFrame({
        "oid": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, n_users, n).astype(np.int64),
        "ots": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 11, n) * 86400, unit="s"),
        "amount": (rng.rand(n) * 100).round(2),
    })


def _sorted(df):
    return df.sort_values(list(df.columns), kind="stable",
                          ignore_index=True)


def _assert_same(res_ds, exp_df):
    res = res_ds.to_pandas()
    assert sorted(res.columns) == sorted(exp_df.columns)
    res, exp = res[sorted(res.columns)], exp_df[sorted(exp_df.columns)]
    pd.testing.assert_frame_equal(
        _sorted(res), _sorted(exp), check_dtype=False)


def _asof_oracle(left, right):
    rows = []
    for _, e in left.iterrows():
        cand = right[(right.user_id == e.user_id) & (right.ots <= e.ts)]
        if not len(cand):
            continue
        best = cand.sort_values(["ots", "oid"]).iloc[-1]
        rows.append({**e.to_dict(), "oid": best.oid, "amount": best.amount})
    return pd.DataFrame(rows)


@pytest.mark.parametrize("cfg", [SHUFFLE_CFG, GATHER_CFG],
                         ids=["shuffle", "gather"])
def test_asof_join(ray_session, cfg):
    import ray.data as rd

    left, right = _events(), _orders()
    res = asof_join(rd.from_pandas(left).repartition(5),
                    rd.from_pandas(right).repartition(3),
                    key="user_id", left_ts="ts", right_ts="ots",
                    right_cols=["oid", "amount"], right_id="oid", cfg=cfg)
    _assert_same(res, _asof_oracle(left, right))


def test_asof_join_no_match_user_dropped(ray_session):
    import ray.data as rd

    left = _events(n=40, n_users=3)
    right = _orders(n=20, n_users=3)
    right = right[right.user_id != 1]        # user 1 has no orders at all
    res = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    key="user_id", left_ts="ts", right_ts="ots",
                    right_cols=["oid", "amount"], right_id="oid",
                    cfg=GATHER_CFG).to_pandas()
    assert not (res["user_id"] == 1).any()
    _assert_same(rd.from_pandas(res) if len(res) else res,
                 _asof_oracle(left, right)) if len(res) else None


def test_asof_join_bigint_ids_exact(ray_session):
    """Integer columns above 2^53 round-trip exactly through the union
    schema (zero-sentinel fill, no float64 hop) — snowflake-style ids."""
    import ray.data as rd

    base = 2 ** 61
    left = pd.DataFrame({
        "k": np.array([1, 1, 2], dtype=np.int64),
        "lid": np.array([base + 1, base + 2, base + 3], dtype=np.int64),
        "ts": np.array([10, 20, 30], dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": np.array([1, 2], dtype=np.int64),
        "rid": np.array([base + 11, base + 12], dtype=np.int64),
        "ots": np.array([5, 25], dtype=np.int64),
    })
    for cfg in (SHUFFLE_CFG, GATHER_CFG):
        res = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                        key="k", left_ts="ts", right_ts="ots",
                        right_cols=["rid"], right_id="rid",
                        cfg=cfg).to_pandas().sort_values("lid",
                                                         ignore_index=True)
        assert res["lid"].tolist() == [base + 1, base + 2, base + 3]
        assert res["rid"].tolist() == [base + 11, base + 11, base + 12]


def test_asof_join_string_tiebreak_deterministic(ray_session):
    """A non-integer right_id no longer raises: ties on right_ts break
    by a deterministic hash of the id (documented semantics)."""
    import ray.data as rd

    left = pd.DataFrame({"k": np.array([1], dtype=np.int64),
                         "ts": np.array([10], dtype=np.int64)})
    right = pd.DataFrame({"k": np.array([1, 1], dtype=np.int64),
                          "rid": ["a", "b"],
                          "ots": np.array([5, 5], dtype=np.int64)})
    picks = set()
    for _ in range(2):
        res = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                        key="k", left_ts="ts", right_ts="ots",
                        right_cols=["rid"], right_id="rid",
                        cfg=GATHER_CFG).to_pandas()
        assert len(res) == 1 and res["rid"][0] in {"a", "b"}
        picks.add(res["rid"][0])
    assert len(picks) == 1  # deterministic across runs


def _range_oracle(left, right, lo_s, hi_s, rcols, key=None):
    if key is not None:
        m = left.merge(right, on=key)
    else:
        m = left.merge(right, how="cross")
    delta = (m["ts"] - m["ots"]).dt.total_seconds()
    m = m[(delta >= lo_s) & (delta <= hi_s)]
    return m[[*left.columns, *rcols]].reset_index(drop=True)


@pytest.mark.parametrize("cfg", [SHUFFLE_CFG, GATHER_CFG],
                         ids=["shuffle", "gather"])
def test_range_join_keyed(ray_session, cfg):
    import ray.data as rd

    left, right = _events(), _orders()
    res = range_join(rd.from_pandas(left).repartition(5),
                     rd.from_pandas(right).repartition(3),
                     left_ts="ts", right_ts="ots",
                     lo_s=0.0, hi_s=3 * 86400.0, key="user_id",
                     right_cols=["oid", "amount"], cfg=cfg)
    exp = _range_oracle(left, right, 0.0, 3 * 86400.0,
                        ["oid", "amount"], key="user_id")
    assert len(exp) > 50        # the fixture must actually exercise overlap
    _assert_same(res, exp)


@pytest.mark.parametrize("cfg", [SHUFFLE_CFG, GATHER_CFG],
                         ids=["shuffle", "gather"])
def test_range_join_keyless(ray_session, cfg):
    """The non-equi path: bucket replication must find every pair
    exactly once (no dupes, no misses across bucket boundaries)."""
    import ray.data as rd

    left = _events(n=120, n_users=3)
    right = _orders(n=40, n_users=3).drop(columns=["user_id"])
    lo_s, hi_s = 3600.0, 2 * 86400.0
    res = range_join(rd.from_pandas(left).repartition(4),
                     rd.from_pandas(right).repartition(2),
                     left_ts="ts", right_ts="ots",
                     lo_s=lo_s, hi_s=hi_s, key=None,
                     right_cols=["oid", "amount"], cfg=cfg)
    exp = _range_oracle(left, right, lo_s, hi_s, ["oid", "amount"])
    assert len(exp) > 20
    _assert_same(res, exp)


def test_range_join_bounds_inclusive(ray_session):
    import ray.data as rd

    left = pd.DataFrame({
        "lid": np.arange(3, dtype=np.int64),
        "ts": pd.to_datetime(
            ["2024-01-01 00:00:00", "2024-01-01 01:00:00",
             "2024-01-01 02:00:00"]),
    })
    right = pd.DataFrame({
        "oid": np.array([0], dtype=np.int64),
        "ots": pd.to_datetime(["2024-01-01 00:00:00"]),
    })
    res = range_join(rd.from_pandas(left), rd.from_pandas(right),
                     left_ts="ts", right_ts="ots", lo_s=0.0, hi_s=3600.0,
                     key=None, right_cols=["oid"],
                     cfg=GATHER_CFG).to_pandas()
    # both endpoints inclusive: deltas 0s and 3600s match, 7200s not
    assert sorted(res["lid"].tolist()) == [0, 1]


@pytest.mark.parametrize("cfg", [SHUFFLE_CFG, GATHER_CFG],
                         ids=["shuffle", "gather"])
def test_group_topk(ray_session, cfg):
    import ray.data as rd

    df = _orders(n=200, n_users=9)
    res = group_topk(rd.from_pandas(df).repartition(6), key="user_id",
                     order_col="amount", k=3, tie_col="oid",
                     with_rank=True, cfg=cfg)
    exp = df.sort_values(["user_id", "amount", "oid"],
                         ascending=[True, False, True], kind="stable") \
        .groupby("user_id").head(3).copy()
    exp["rank"] = exp.groupby("user_id").cumcount() + 1
    _assert_same(res, exp)


def test_group_topk_partial_is_exact_under_splits(ray_session):
    """The per-block combiner must not lose global winners: compare a
    1-block run against a many-block run of the same data."""
    import ray.data as rd

    df = _orders(n=150, n_users=4)
    one = group_topk(rd.from_pandas(df).repartition(1), key="user_id",
                     order_col="amount", k=5, tie_col="oid",
                     cfg=SHUFFLE_CFG).to_pandas()
    many = group_topk(rd.from_pandas(df).repartition(25), key="user_id",
                      order_col="amount", k=5, tie_col="oid",
                      cfg=SHUFFLE_CFG).to_pandas()
    pd.testing.assert_frame_equal(_sorted(one), _sorted(many),
                                  check_dtype=False)


@pytest.mark.parametrize("cfg", [SHUFFLE_CFG, GATHER_CFG],
                         ids=["shuffle", "gather"])
def test_grouped_quantiles_matches_duckdb(ray_session, cfg):
    """quantile_disc parity — the exact semantics the SQL oracle uses."""
    import duckdb
    import ray.data as rd

    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "k": rng.choice(list("abcd"), 500),
        "x": (rng.rand(500) * 100).round(1),
    })
    res = grouped_quantiles(rd.from_pandas(df).repartition(7), key="k",
                            col="x", qs=[0.25, 0.5, 0.9],
                            cfg=cfg).to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        SELECT k, 0.25 AS q, quantile_disc(x, 0.25) AS value FROM t GROUP BY 1
        UNION ALL
        SELECT k, 0.5, quantile_disc(x, 0.5) FROM t GROUP BY 1
        UNION ALL
        SELECT k, 0.9, quantile_disc(x, 0.9) FROM t GROUP BY 1
    """).fetchdf()
    exp["q"] = exp["q"].astype(float)
    pd.testing.assert_frame_equal(
        _sorted(res[sorted(res.columns)]), _sorted(exp[sorted(exp.columns)]),
        check_dtype=False)


def test_filter_by_group_quantile(ray_session):
    import duckdb
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import (
        filter_by_group_quantile,
    )

    rng = np.random.RandomState(13)
    df = pd.DataFrame({
        "i": np.arange(400, dtype=np.int64),
        "k": rng.choice(list("abc"), 400),
        "x": (rng.rand(400) * 50).round(2),
    })
    ds = rd.from_pandas(df).repartition(5)
    con = duckdb.connect()
    con.register("t", df)
    for keep, op in (("ge", ">="), ("le", "<=")):
        res = filter_by_group_quantile(
            ds, key="k", col="x", q=0.5, keep=keep,
            cfg=SHUFFLE_CFG).to_pandas()
        exp = con.execute(f"""
            WITH thr AS (
                SELECT k, quantile_disc(x, 0.5) AS t FROM t GROUP BY k)
            SELECT i, t.k, x FROM t JOIN thr USING (k) WHERE x {op} thr.t
        """).fetchdf()
        pd.testing.assert_frame_equal(
            _sorted(res[sorted(res.columns)]),
            _sorted(exp[sorted(exp.columns)]), check_dtype=False)
    with pytest.raises(ValueError):
        filter_by_group_quantile(ds, key="k", col="x", keep="gt")


def test_rollup_sum(ray_session):
    import duckdb
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import rollup_sum

    rng = np.random.RandomState(31)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 400),
        "b": rng.choice(["p", "q"], 400),
        "n": rng.randint(0, 50, 400).astype(np.int64),
    })
    got = rollup_sum(rd.from_pandas(df).repartition(5),
                     keys=["a", "b"], val_cols=["n"],
                     cfg=SHUFFLE_CFG).to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        SELECT coalesce(a, '(all)') AS a, coalesce(b, '(all)') AS b,
               CAST(sum(n) AS BIGINT) AS n
        FROM t GROUP BY ROLLUP(a, b)
    """).fetchdf()
    pd.testing.assert_frame_equal(
        _sorted(got[sorted(got.columns)]).reset_index(drop=True),
        _sorted(exp[sorted(exp.columns)]).reset_index(drop=True),
        check_dtype=False)
    # level structure: 3x2 leaf rows + 3 prefix rows + 1 grand total
    assert len(got) == 6 + 3 + 1
    assert got[(got["a"] == "(all)") & (got["b"] == "(all)")]["n"] \
        .iloc[0] == df["n"].sum()


def test_pivot_counts(ray_session):
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import (
        pivot_counts,
    )

    rng = np.random.RandomState(37)
    df = pd.DataFrame({
        "u": rng.randint(0, 20, 500).astype(np.int64),
        "t": rng.choice(["a", "b", "c", "other"], 500),
    })
    got = pivot_counts(rd.from_pandas(df).repartition(6), key="u",
                       pivot_col="t", values=["a", "b", "c"],
                       cfg=SHUFFLE_CFG).to_pandas() \
        .set_index("u").sort_index()
    exp = pd.crosstab(df["u"], df["t"])
    for v in ["a", "b", "c"]:
        assert got[v].tolist() == exp[v].reindex(got.index,
                                                 fill_value=0).tolist()
    assert "other" not in got.columns      # fixed output schema
    with pytest.raises(ValueError):
        pivot_counts(rd.from_pandas(df), key="u", pivot_col="t",
                     values=[])


def test_dataset_diff(ray_session):
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import (
        dataset_diff,
    )

    a = pd.DataFrame({"i": [1, 2, 3, 4], "t": ["x", "y", "z", None]})
    b = pd.DataFrame({"i": [2, 3, 5, 4], "t": ["y", "Z", "new", None]})
    got = dataset_diff(rd.from_pandas(a).repartition(2),
                       rd.from_pandas(b).repartition(3),
                       id_col="i", col="t", cfg=SHUFFLE_CFG).to_pandas() \
        .set_index("i")["status"]
    assert got[1] == "removed"
    assert got[2] == "same"
    assert got[3] == "changed"
    assert got[4] == "same"        # null text on both sides -> same
    assert got[5] == "added"
    assert len(got) == 5


def test_keyed_sum(ray_session):
    """The engine-wide aggregate shape: matches pandas groupby
    (including null keys), is repartition-invariant, and float sums
    are identical across block layouts (block-sorted combine)."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import keyed_sum

    rng = np.random.RandomState(29)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", None], 2000),
        "n": rng.randint(0, 100, 2000).astype(np.int64),
        "x": rng.rand(2000),
    })
    exp = df.groupby("k", dropna=False)[["n", "x"]].sum().reset_index()

    for parts in (3, 17):
        got = keyed_sum(rd.from_pandas(df).repartition(parts),
                        ["k"], ["n", "x"], SHUFFLE_CFG).to_pandas() \
            .sort_values("k", na_position="last").reset_index(drop=True)
        e = exp.sort_values("k", na_position="last").reset_index(drop=True)
        assert got["n"].tolist() == e["n"].tolist()   # ints: exact always
        assert np.allclose(got["x"], e["x"], rtol=1e-12)
    # floats: bit-identical ACROSS RUNS for a fixed block layout (the
    # sorted final combine removes shuffle-arrival order); layouts
    # themselves change the partial multiset, like any distributed sum
    runs = [keyed_sum(rd.from_pandas(df).repartition(7), ["k"],
                      ["n", "x"], SHUFFLE_CFG).to_pandas()
            .sort_values("k", na_position="last")["x"].to_numpy()
            for _ in range(2)]
    assert (runs[0] == runs[1]).all()


@pytest.mark.parametrize("cfg", [SHUFFLE_CFG, GATHER_CFG],
                         ids=["shuffle", "gather"])
def test_grouped_percent_rank(ray_session, cfg):
    import duckdb
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import (
        grouped_percent_rank,
    )

    rng = np.random.RandomState(23)
    df = pd.DataFrame({
        "i": np.arange(301, dtype=np.int64),
        "k": np.concatenate([rng.choice(list("ab"), 300), ["solo"]]),
        # coarse rounding plants plenty of ties
        "x": np.concatenate([(rng.rand(300) * 10).round(0), [5.0]]),
    })
    res = grouped_percent_rank(rd.from_pandas(df).repartition(7),
                               key="k", col="x", cfg=cfg).to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        SELECT i, k, x, percent_rank() OVER (PARTITION BY k ORDER BY x)
               AS percent_rank FROM t
    """).fetchdf()
    pd.testing.assert_frame_equal(
        _sorted(res[sorted(res.columns)]),
        _sorted(exp[sorted(exp.columns)]), check_dtype=False)
    assert res[res["k"] == "solo"]["percent_rank"].iloc[0] == 0.0


def test_sliding_window_agg(ray_session):
    import ray.data as rd

    ev = _events(n=400)
    res = sliding_window_agg(rd.from_pandas(ev).repartition(5),
                             window_s=3600, slide_s=900,
                             value_col="v").to_pandas()
    # oracle: every event hits the 4 windows [bucket-3 .. bucket] * 900s
    b = (ev["ts"].astype("datetime64[us]").astype(np.int64)
         // (900 * 10**6)).to_numpy()
    ws = (np.repeat(b, 4) - np.tile(np.arange(4), len(ev))) * 900 * 10**6
    exp = pd.DataFrame({"window_start": ws.astype("datetime64[us]"),
                        "v": np.repeat(ev["v"].to_numpy(), 4)}) \
        .groupby("window_start").agg(n_events=("v", "size"),
                                     sum_value=("v", "sum")).reset_index()
    res = res.sort_values("window_start", ignore_index=True)
    exp = exp.sort_values("window_start", ignore_index=True)
    assert res["window_start"].tolist() == exp["window_start"].tolist()
    assert res["n_events"].tolist() == exp["n_events"].tolist()
    np.testing.assert_allclose(res["sum_value"], exp["sum_value"],
                               rtol=1e-12)
    # every window covers exactly window_s of events: spot-check one
    w0 = res.iloc[len(res) // 2]
    lo = w0["window_start"]
    hi = lo + pd.Timedelta(seconds=3600)
    assert w0["n_events"] == ((ev["ts"] >= lo) & (ev["ts"] < hi)).sum()


def test_sliding_window_rejects_bad_slide(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError):
        sliding_window_agg(rd.from_pandas(_events(n=10)),
                           window_s=3600, slide_s=1000)


@pytest.mark.parametrize("cfg", [SHUFFLE_CFG, GATHER_CFG],
                         ids=["shuffle", "gather"])
def test_grouped_running_sum(ray_session, cfg):
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import (
        grouped_running_sum)

    df = _events(n=400)
    df["v_int"] = (df["v"] * 1000).astype(np.int64)
    got = grouped_running_sum(
        rd.from_pandas(df), key="user_id", order_cols=["ts", "event_id"],
        val_col="v_int", out_col="run", cfg=cfg).to_pandas()
    exp = df.sort_values(["user_id", "ts", "event_id"], kind="stable").copy()
    exp["run"] = exp.groupby("user_id", sort=False)["v_int"].cumsum()
    key = ["user_id", "event_id"]
    got = got.sort_values(key, kind="stable").reset_index(drop=True)
    exp = exp.sort_values(key, kind="stable").reset_index(drop=True)
    assert (got["run"].to_numpy() == exp["run"].to_numpy()).all()
    assert set(got.columns) == set(exp.columns)


@pytest.mark.parametrize("cfg", [SHUFFLE_CFG, GATHER_CFG],
                         ids=["shuffle", "gather"])
@pytest.mark.parametrize("offset", [1, 2, -1])
def test_grouped_lag(ray_session, cfg, offset):
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import grouped_lag

    df = _events(n=400)
    got = grouped_lag(
        rd.from_pandas(df), key="user_id", order_cols=["ts", "event_id"],
        cols=["ts", "v"], offset=offset, cfg=cfg).to_pandas()
    exp = df.sort_values(["user_id", "ts", "event_id"], kind="stable").copy()
    g = exp.groupby("user_id", sort=False)
    exp["prev_ts"] = g["ts"].shift(offset)
    exp["prev_v"] = g["v"].shift(offset)
    key = ["user_id", "event_id"]
    got = got.sort_values(key, kind="stable").reset_index(drop=True)
    exp = exp.sort_values(key, kind="stable").reset_index(drop=True)
    assert got["prev_ts"].equals(exp["prev_ts"])
    assert got["prev_v"].equals(exp["prev_v"])
    assert set(got.columns) == set(exp.columns)


def test_grouped_lag_rejects_zero_offset_and_collision(ray_session):
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import grouped_lag

    ds = rd.from_pandas(_events(n=10))
    with pytest.raises(ValueError, match="nonzero"):
        grouped_lag(ds, key="user_id", order_cols=["ts"], cols=["v"],
                    offset=0)
    with pytest.raises(ValueError, match="collide"):
        grouped_lag(ds, key="user_id", order_cols=["ts"], cols=["v"],
                    prefix="")


@pytest.mark.parametrize("right_rows", [None, 0],
                         ids=["shuffle", "broadcast"])
def test_anti_join(ray_session, right_rows):
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import anti_join

    left = pd.DataFrame({
        "k": np.arange(50, dtype=np.int64),
        "name": [f"n{i}" for i in range(50)],
    })
    right = pd.DataFrame({"k": np.repeat(np.arange(0, 50, 3), 2)})
    rr = len(right) if right_rows == 0 else None  # 0 sentinel -> broadcast
    got = anti_join(rd.from_pandas(left), rd.from_pandas(right),
                    on=["k"], cfg=SHUFFLE_CFG, right_rows=rr).to_pandas()
    exp = left[~left["k"].isin(right["k"])].reset_index(drop=True)
    got = got.sort_values("k").reset_index(drop=True)
    assert got.equals(exp.astype(got.dtypes.to_dict()))


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_anti_join_null_and_numeric_keys(ray_session, strategy):
    """BOTH strategy paths follow SQL NOT EXISTS semantics on the same
    mixed-dtype fixture: null right keys match nothing, null left keys
    are kept, and numeric keys compare natively across physical dtypes
    (float64 2.0 matches Int64 2 — the shuffle path promotes mismatched
    numeric keys to a common super-type before the Arrow hash join)."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import anti_join

    left = pd.DataFrame({"k": [1.0, 2.0, None, 3.0],
                         "v": list("abcd")})
    right = pd.DataFrame({"k": pd.array([2, None], dtype="Int64")})
    rr = len(right) if strategy == "broadcast" else None
    got = anti_join(rd.from_pandas(left), rd.from_pandas(right),
                    on=["k"], cfg=SHUFFLE_CFG,
                    right_rows=rr).to_pandas()
    assert sorted(got["v"]) == ["a", "c", "d"]  # 2.0 dropped, null kept
    assert list(got.columns) == ["k", "v"]      # no temp join columns


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_semi_join(ray_session, strategy):
    """EXISTS semantics on both strategy paths: each matched left row
    emitted exactly ONCE despite duplicate right keys spread across
    blocks; null left keys dropped, null right keys match nothing;
    mixed numeric dtypes compare natively."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import semi_join

    left = pd.DataFrame({"k": [1.0, 2.0, None, 3.0, 4.0],
                         "v": list("abcde")})
    # key 2 appears 6 times spread over 3 blocks — the dup-key trap
    right = pd.DataFrame({"k": pd.array([2, 2, 2, 2, 2, 2, 4, None],
                                        dtype="Int64")})
    rr = len(right) if strategy == "broadcast" else None
    got = semi_join(rd.from_pandas(left),
                    rd.from_pandas(right).repartition(3),
                    on=["k"], cfg=SHUFFLE_CFG, right_rows=rr).to_pandas()
    assert sorted(got["v"]) == ["b", "e"]       # exactly once each
    assert list(got.columns) == ["k", "v"]

    # complement property vs anti_join on integer keys
    from aml_entity_resolution_assignment_ray.ops.relational import anti_join

    li = pd.DataFrame({"k": np.arange(30, dtype=np.int64)})
    ri = pd.DataFrame({"k": np.arange(0, 30, 3, dtype=np.int64)})
    s = semi_join(rd.from_pandas(li), rd.from_pandas(ri), on=["k"],
                  cfg=SHUFFLE_CFG, right_rows=rr and len(ri)).to_pandas()
    a = anti_join(rd.from_pandas(li), rd.from_pandas(ri), on=["k"],
                  cfg=SHUFFLE_CFG, right_rows=rr and len(ri)).to_pandas()
    assert sorted(s["k"].tolist() + a["k"].tolist()) == list(range(30))


def test_anti_join_int_width_mismatch_shuffle(ray_session):
    """int32 left keys vs int64 right keys promote to int64 on the
    shuffle path and match exactly."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import anti_join

    left = pd.DataFrame({"k": np.arange(20, dtype=np.int32), "v": range(20)})
    right = pd.DataFrame({"k": np.arange(0, 20, 4, dtype=np.int64)})
    got = anti_join(rd.from_pandas(left), rd.from_pandas(right),
                    on=["k"], cfg=SHUFFLE_CFG, right_rows=None).to_pandas()
    exp = sorted(i for i in range(20) if i % 4 != 0)
    assert sorted(got["k"].tolist()) == exp


def test_scrub_lineage_tag(ray_session):
    """scrub_empty_blocks marks its output; a second scrub of the same
    object is a no-op fast path (same object back), while a TRANSFORM of
    a scrubbed dataset loses the mark and scrubs again."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.util import scrub_empty_blocks

    ds = rd.from_pandas(pd.DataFrame({"x": range(10)})).repartition(4)
    s1 = scrub_empty_blocks(ds)
    assert getattr(s1, "_er_scrubbed", False)
    assert scrub_empty_blocks(s1) is s1
    mapped = s1.map_batches(lambda df: df, batch_format="pandas")
    assert not getattr(mapped, "_er_scrubbed", False)
    s2 = scrub_empty_blocks(mapped)
    assert s2.count() == 10 and getattr(s2, "_er_scrubbed", False)

    # the all-empty/no-schema result stays untagged (poison blocks kept)
    empty = scrub_empty_blocks(
        rd.from_pandas(pd.DataFrame({"x": []})).repartition(2))
    assert not getattr(empty, "_er_scrubbed", False)


def test_grouped_zscore(ray_session):
    """Z-scores match a pandas replay; constant groups get 0."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import grouped_zscore

    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "event_id": np.arange(60, dtype=np.int64),
        "k": ["a", "b", "c"] * 20,
        "v": rng.uniform(0, 100, 60),
    })
    df.loc[df["k"] == "c", "v"] = 7.0  # constant group
    out = grouped_zscore(rd.from_pandas(df).repartition(4), key="k",
                         col="v", keep_cols=["event_id"], cfg=SHUFFLE_CFG) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    exp = df.copy()
    g = df.groupby("k")["v"]
    mu = g.transform("mean")
    sd = g.transform(lambda s: s.std(ddof=0))
    exp["z"] = np.where(sd > 0, (df["v"] - mu) / sd, 0.0)
    assert np.allclose(out["zscore"].to_numpy(),
                       exp.sort_values("event_id")["z"].to_numpy(),
                       rtol=1e-9, atol=1e-12)
    assert (out[out["k"] == "c"]["zscore"] == 0.0).all()


def test_rollup_sum_rejects_null_and_filler_keys(ray_session):
    """A NULL key (or a genuine filler value) would silently alias
    rolled-up rows vs the SQL coalesce — the op must refuse instead."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import rollup_sum

    with_null = pd.DataFrame({
        "a": pd.array(["x", None, "y"], dtype="string"),
        "n": np.array([1, 2, 3], dtype=np.int64),
    })
    with pytest.raises(Exception, match="NULL"):
        rollup_sum(rd.from_pandas(with_null), keys=["a"],
                   val_cols=["n"], cfg=SHUFFLE_CFG).to_pandas()
    with_filler = pd.DataFrame({
        "a": pd.array(["x", "(all)", "y"], dtype="string"),
        "n": np.array([1, 2, 3], dtype=np.int64),
    })
    with pytest.raises(Exception, match="filler"):
        rollup_sum(rd.from_pandas(with_filler), keys=["a"],
                   val_cols=["n"], cfg=SHUFFLE_CFG).to_pandas()


def test_grouped_percent_rank_nulls_rank_last(ray_session):
    """NULL values of the ranked column sit LAST as one peer group,
    matching the SQL window's NULLS LAST (r4 advice: pandas rank
    previously emitted NaN for them)."""
    import duckdb
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import (
        grouped_percent_rank,
    )

    df = pd.DataFrame({
        "i": np.arange(8, dtype=np.int64),
        "k": ["a"] * 5 + ["b"] * 3,
        "x": [1.0, np.nan, 2.0, np.nan, 0.5, np.nan, 7.0, 7.0],
    })
    res = grouped_percent_rank(rd.from_pandas(df).repartition(3),
                               key="k", col="x",
                               cfg=SHUFFLE_CFG).to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        SELECT i, percent_rank() OVER (PARTITION BY k ORDER BY x)
               AS percent_rank FROM t
    """).fetchdf().set_index("i")["percent_rank"]
    got = res.set_index("i")["percent_rank"]
    for i in range(8):
        assert got[i] == exp[i], (i, got[i], exp[i])


def test_keyed_sum_empty_blocks_share_schema(ray_session):
    """Empty blocks (common after a hash repartition with few keys)
    must project to (keys, val_cols) like aggregated blocks do, not
    leak extra input columns / original column order."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import keyed_sum

    df = pd.DataFrame({
        "extra": np.arange(50, dtype=np.int64),
        "k": ["only_key"] * 50,
        "n": np.ones(50, dtype=np.int64),
    })
    out = keyed_sum(rd.from_pandas(df).repartition(8), ["k"], ["n"],
                    SHUFFLE_CFG)
    assert list(out.schema().names) == ["k", "n"]
    got = out.to_pandas()
    assert list(got.columns) == ["k", "n"]
    assert got["n"].iloc[0] == 50


@pytest.mark.parametrize("cfg", [SHUFFLE_CFG, GATHER_CFG],
                         ids=["shuffle", "gather"])
@pytest.mark.parametrize("n", [1, 4, 7, 500])
def test_grouped_ntile(ray_session, cfg, n):
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import (
        grouped_ntile,
    )

    df = _events(n=400)
    got = grouped_ntile(
        rd.from_pandas(df), key="user_id", order_cols=["v", "event_id"],
        n=n, cfg=cfg).to_pandas()

    def sql_ntile(size, r, n):
        big, rem = size // n + 1, size % n
        if r < rem * big:
            return r // big + 1
        return rem + (r - rem * big) // (size // n) + 1

    exp = df.sort_values(["user_id", "v", "event_id"],
                         kind="stable").copy()
    g = exp.groupby("user_id", sort=False)
    exp["tile"] = [
        sql_ntile(s, r, n)
        for s, r in zip(g["user_id"].transform("size"), g.cumcount())]
    key = ["user_id", "event_id"]
    got = got.sort_values(key, kind="stable").reset_index(drop=True)
    exp = exp.sort_values(key, kind="stable").reset_index(drop=True)
    assert (got["tile"].to_numpy() == exp["tile"].to_numpy()).all()
    # bucket sizes differ by at most one within each group
    for _, grp in got.groupby("user_id"):
        c = grp["tile"].value_counts()
        assert c.max() - c.min() <= 1
        assert c.index.min() == 1

    with pytest.raises(ValueError, match="n must"):
        grouped_ntile(rd.from_pandas(df), key="user_id",
                      order_cols=["v"], n=0)


@pytest.mark.parametrize("cfg", [SHUFFLE_CFG, GATHER_CFG])
def test_global_running_sum(ray_session, cfg):
    """Two-level bucketed prefix sum == the single-node cumsum over
    the same total order, on both the keyed-shuffle and gather paths
    and across block layouts."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.events import (
        global_running_sum,
    )

    rng = np.random.RandomState(17)
    n = 400
    df = pd.DataFrame({
        "event_id": rng.permutation(n).astype(np.int64),
        "t": rng.randint(0, 50, n).astype(np.int64),   # many ties
        "cents": rng.randint(-100, 1000, n).astype(np.int64),
    })
    df["bucket"] = df["t"] // 10

    exp = df.sort_values(["t", "event_id"], kind="stable").copy()
    exp["running"] = exp["cents"].cumsum()

    got = global_running_sum(
        rd.from_pandas(df).repartition(6), bucket_col="bucket",
        order_cols=["t", "event_id"], val_col="cents", cfg=cfg) \
        .to_pandas().sort_values(["t", "event_id"], kind="stable")
    assert (got["running"].to_numpy()
            == exp["running"].to_numpy()).all()
    assert got["running"].dtype == np.int64


@pytest.mark.parametrize("cfg", [SHUFFLE_CFG, GATHER_CFG])
def test_funnel_conversion(ray_session, cfg):
    """Vectorized funnel == a brute-force per-user scan: strict-after
    ordering, early drop-out, and users with zero steps."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.events import (
        funnel_conversion,
    )

    rng = np.random.RandomState(23)
    n = 600
    df = pd.DataFrame({
        "u": rng.randint(0, 30, n).astype(np.int64),
        "t": rng.permutation(n).astype(np.int64),
        "step": rng.choice(["a", "b", "c", "x"], n,
                           p=[0.2, 0.2, 0.1, 0.5]),
    })
    steps = ["a", "b", "c"]

    def brute(g):
        t_prev, done = -np.inf, 0
        for s in steps:
            cand = g[(g["step"] == s) & (g["t"] > t_prev)]
            if not len(cand):
                break
            t_prev = cand["t"].min()
            done += 1
        return done

    exp = df.groupby("u").apply(brute, include_groups=False)
    got = funnel_conversion(
        rd.from_pandas(df).repartition(7), key="u", ts_col="t",
        step_col="step", steps=steps, cfg=cfg,
        n_rows=n).to_pandas().set_index("u")["steps_completed"]
    assert (got.sort_index() == exp.sort_index()).all()

    with pytest.raises(ValueError, match="non-empty"):
        funnel_conversion(rd.from_pandas(df), key="u", ts_col="t",
                          step_col="step", steps=[])


@pytest.mark.parametrize("how,cfg", [("min", SHUFFLE_CFG),
                                     ("max", SHUFFLE_CFG),
                                     ("min", GATHER_CFG)])
def test_keyed_reduce(ray_session, how, cfg):
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import (
        keyed_reduce,
    )

    rng = np.random.RandomState(31)
    df = pd.DataFrame({
        "k": rng.randint(0, 20, 300).astype(np.int64),
        "a": rng.randint(-1000, 1000, 300).astype(np.int64),
        "b": rng.rand(300).round(4),
    })
    got = keyed_reduce(rd.from_pandas(df).repartition(6), ["k"],
                       ["a", "b"], how=how, cfg=cfg,
                       n_rows=len(df)).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    exp = getattr(df.groupby("k")[["a", "b"]], how)().reset_index()
    pd.testing.assert_frame_equal(got, exp)

    with pytest.raises(ValueError, match="not in"):
        keyed_reduce(rd.from_pandas(df), ["k"], ["a"], how="mean")


@pytest.mark.parametrize("cfg", [SHUFFLE_CFG, GATHER_CFG])
def test_token_budget_sample(ray_session, cfg):
    """Budgeted per-group selection == brute-force hash-order cumsum;
    layout-invariant; budget 0 keeps nothing."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.sample import (
        _hash_ints,
        token_budget_sample,
    )

    rng = np.random.RandomState(41)
    df = pd.DataFrame({
        "g": rng.choice(["x", "y", "z"], 200),
        "id": rng.permutation(200).astype(np.int64),
        "tok": rng.randint(1, 50, 200).astype(np.int64),
    })
    budget = 300

    b = df.copy()
    b["_h"] = _hash_ints(b["id"].to_numpy(np.int64)).astype(np.int64)
    b = b.sort_values(["g", "_h", "id"], kind="stable")
    b["cum_tok"] = b.groupby("g", sort=False)["tok"].cumsum()
    exp = b[b["cum_tok"] <= budget].drop(columns="_h") \
        .sort_values("id").reset_index(drop=True)

    got = token_budget_sample(
        rd.from_pandas(df).repartition(5), group_col="g", id_col="id",
        token_col="tok", budget=budget, cfg=cfg, n_rows=len(df)) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)
    # every group honored the budget but came close to it
    tot = got.groupby("g")["tok"].sum()
    assert (tot <= budget).all() and (tot > budget - 50).all()

    empty = token_budget_sample(rd.from_pandas(df), group_col="g",
                                id_col="id", token_col="tok", budget=0,
                                cfg=cfg, n_rows=len(df)).to_pandas()
    assert len(empty) == 0


@pytest.mark.usefixtures("ray_session")
def test_grouped_ewma_exact_and_layout_invariant():
    """Fixed-point EWMA == the sequential integer recursion, identical
    across block layouts; negative values rejected."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import (
        grouped_ewma,
    )

    rng = np.random.default_rng(9)
    n = 400
    df = pd.DataFrame({
        "k": rng.choice(["u1", "u2", "u3"], size=n),
        "t": rng.permutation(n).astype(np.int64),
        "v": rng.integers(0, 50_000, size=n).astype(np.int64),
    })

    def ref(g):
        ew, out = None, []
        for v in g.sort_values("t")["v"]:
            ew = int(v) if ew is None else (25 * int(v) + 75 * ew) // 100
            out.append(ew)
        return pd.Series(out, index=g.sort_values("t").index)

    want = df.copy()
    want["ewma"] = pd.concat(
        [ref(g) for _, g in df.groupby("k")]).sort_index()

    got = grouped_ewma(rd.from_pandas(df).repartition(5), key="k",
                       order_cols=["t"], val_col="v").to_pandas() \
        .sort_values(["k", "t"]).reset_index(drop=True)
    exp = want.sort_values(["k", "t"]).reset_index(drop=True)
    assert (got["ewma"].to_numpy() == exp["ewma"].to_numpy()).all()

    got2 = grouped_ewma(rd.from_pandas(df).repartition(11), key="k",
                        order_cols=["t"], val_col="v").to_pandas() \
        .sort_values(["k", "t"]).reset_index(drop=True)
    assert (got2["ewma"].to_numpy() == got["ewma"].to_numpy()).all()

    bad = df.copy()
    bad.loc[0, "v"] = -1
    with pytest.raises(Exception, match="non-negative"):
        grouped_ewma(rd.from_pandas(bad), key="k", order_cols=["t"],
                     val_col="v").to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_cube_sum_matches_pandas_and_rejects_filler():
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import cube_sum

    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y"], size=200),
        "b": rng.choice(["p", "q", "r"], size=200),
        "v": rng.integers(0, 1000, size=200).astype(np.int64),
    })
    got = cube_sum(rd.from_pandas(df).repartition(5),
                   keys=["a", "b"], val_cols=["v"]).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)

    rows = []
    for sub in ([["a", "b"], ["a"], ["b"], []]):
        g = (df.groupby(sub)["v"].sum().reset_index() if sub
             else pd.DataFrame({"v": [df["v"].sum()]}))
        for c in ("a", "b"):
            if c not in sub:
                g[c] = "(all)"
        rows.append(g[["a", "b", "v"]])
    want = pd.concat(rows, ignore_index=True) \
        .sort_values(["a", "b"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["a"].astype(str).to_numpy() == want["a"].to_numpy()).all()
    assert (got["b"].astype(str).to_numpy() == want["b"].to_numpy()).all()
    assert (got["v"].to_numpy() == want["v"].to_numpy()).all()

    bad = df.copy()
    bad.loc[0, "a"] = "(all)"
    with pytest.raises(Exception, match="filler"):
        cube_sum(rd.from_pandas(bad), keys=["a", "b"],
                 val_cols=["v"]).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_categorical_mi_known_values():
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.profile import (
        categorical_mi,
    )

    # independent columns -> MI == 0 exactly (uniform 2x2)
    ind = pd.DataFrame({"a": ["x", "x", "y", "y"] * 25,
                        "b": ["p", "q", "p", "q"] * 25})
    got = categorical_mi(rd.from_pandas(ind), col_a="a",
                         col_b="b").to_pandas()
    assert got["mi"].iloc[0] == 0.0
    assert got["n_rows"].iloc[0] == 100

    # perfectly dependent -> MI == H(a) = ln 2
    dep = pd.DataFrame({"a": ["x", "y"] * 50, "b": ["p", "q"] * 50})
    got = categorical_mi(rd.from_pandas(dep).repartition(4),
                         col_a="a", col_b="b").to_pandas()
    assert got["mi"].iloc[0] == round(np.log(2), 6)


@pytest.mark.parametrize("cfg", [SHUFFLE_CFG, GATHER_CFG])
def test_retention_cohorts(ray_session, cfg):
    """Cohort triangle == a brute-force pandas reference: first-touch
    cohorts, duplicate events collapse to one (user, bucket), and
    offset-0 cells equal cohort sizes."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.events import (
        retention_cohorts,
    )

    rng = np.random.RandomState(31)
    n = 900
    df = pd.DataFrame({
        "u": rng.randint(0, 40, n).astype(np.int64),
        "bkt": rng.randint(100, 130, n).astype(np.int64),
    })
    # duplicates on purpose: same user active twice in one bucket
    df = pd.concat([df, df.head(50)], ignore_index=True)

    pairs = df.drop_duplicates()
    cohort = pairs.groupby("u")["bkt"].min().rename("c")
    j = pairs.join(cohort, on="u")
    exp = (j.assign(offset=j["bkt"] - j["c"])
           .groupby(["c", "offset"]).size().rename("n_users")
           .reset_index())

    got = retention_cohorts(
        rd.from_pandas(df).repartition(7), user_col="u",
        bucket_col="bkt", cfg=cfg, n_rows=len(df)).to_pandas()
    g = got.sort_values(["cohort", "offset"]).reset_index(drop=True)
    e = exp.sort_values(["c", "offset"]).reset_index(drop=True)
    assert (g["cohort"].to_numpy() == e["c"].to_numpy()).all()
    assert (g["offset"].to_numpy() == e["offset"].to_numpy()).all()
    assert (g["n_users"].to_numpy() == e["n_users"].to_numpy()).all()
    # offset-0 diagonal = cohort sizes
    diag = g[g["offset"] == 0].set_index("cohort")["n_users"]
    sizes = cohort.value_counts().sort_index()
    assert (diag.sort_index().to_numpy() == sizes.to_numpy()).all()


@pytest.mark.parametrize("cfg", [SHUFFLE_CFG, GATHER_CFG])
def test_grouped_frame_sum(ray_session, cfg):
    """Cumsum-difference frame == pandas groupby.rolling, exact int64;
    preceding=0 degenerates to the value itself."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import (
        grouped_frame_sum,
    )

    rng = np.random.RandomState(41)
    n = 800
    df = pd.DataFrame({
        "k": rng.randint(0, 25, n).astype(np.int64),
        "t": rng.permutation(n).astype(np.int64),
        "v": rng.randint(-5000, 5000, n).astype(np.int64),
    })
    s = df.sort_values(["k", "t"], kind="stable")
    exp = (s.groupby("k", sort=False)["v"]
           .rolling(4, min_periods=1).sum()
           .reset_index(level=0, drop=True).astype(np.int64))

    got = grouped_frame_sum(
        rd.from_pandas(df).repartition(7), key="k", order_cols=["t"],
        val_col="v", preceding=3, cfg=cfg).to_pandas() \
        .sort_values(["k", "t"], kind="stable")
    assert (got["frame_sum"].to_numpy() == exp.to_numpy()).all()
    assert got["frame_sum"].dtype == np.int64

    one = grouped_frame_sum(
        rd.from_pandas(df), key="k", order_cols=["t"], val_col="v",
        preceding=0, cfg=cfg).to_pandas().sort_values(["k", "t"])
    assert (one["frame_sum"].to_numpy() == one["v"].to_numpy()).all()

    with pytest.raises(ValueError):
        grouped_frame_sum(rd.from_pandas(df), key="k", order_cols=["t"],
                          val_col="v", preceding=-1, cfg=cfg)


@pytest.mark.parametrize("cfg", [SHUFFLE_CFG, GATHER_CFG])
def test_grouped_winsorize(ray_session, cfg):
    """Clamp bounds are the exact discrete quantiles; values inside
    the band pass through untouched; dtype stays int64."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import (
        grouped_winsorize,
    )

    rng = np.random.RandomState(53)
    n = 1000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], n),
        "v": rng.randint(-1000, 1000, n).astype(np.int64),
    })

    def disc(g, q):
        s = np.sort(g)
        return s[max(int(np.ceil(q * len(s))), 1) - 1]

    got = grouped_winsorize(
        rd.from_pandas(df).repartition(6), key="k", col="v",
        q_lo=0.1, q_hi=0.9, cfg=cfg).to_pandas()
    assert got["winsorized"].dtype == np.int64
    assert len(got) == n
    for kval, g in df.groupby("k"):
        lo, hi = disc(g["v"].to_numpy(), 0.1), disc(g["v"].to_numpy(), 0.9)
        sub = got[got["k"] == kval]
        exp = np.clip(sub["v"].to_numpy(), lo, hi)
        assert (sub["winsorized"].to_numpy() == exp).all()

    with pytest.raises(ValueError):
        grouped_winsorize(rd.from_pandas(df), key="k", col="v",
                          q_lo=0.9, q_hi=0.1, cfg=cfg)
