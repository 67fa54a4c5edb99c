"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship entity-resolution pipeline on a small
seeded synthetic transcript corpus (the engine's input shape per
BASELINE.json input_hint; /root/testdata carries no transcript table).
``queries()`` exposes one callable per implemented operator family from
SURVEY.md §2 plus the training-data ops (dedup / ANN / text analysis /
multimodal); ``oracle_sql()`` gives DuckDB-equivalent SQL for every
SQL-expressible one.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
from collections.abc import Callable
from functools import lru_cache
from typing import Any

import numpy as np
import pandas as pd


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def _read(sf_dir: str, table: str, spread: bool = False):
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"))
    if spread:
        # single-row-group files arrive as ONE block; kernel-heavy ops
        # (minhash/simhash/grams) need the rows spread across blocks to
        # parallelize (real corpora are many-file and never need this)
        from ray.data import DataContext

        ds = ds.repartition(max(8, DataContext.get_current().min_parallelism))
    return ds


def _tune_context():
    """Small-data context: default 200-way shuffles drown test inputs."""
    from aml_entity_resolution_assignment_ray.util import tune_context

    ctx = tune_context()
    if ctx.min_parallelism > 32:
        tune_context(nparts=16)


def _corpus_entities(sf_dir: str) -> int:
    name = os.path.basename(os.path.normpath(sf_dir))
    return {"sf0.001": 150, "sf0.01": 800, "sf0.1": 4000}.get(name, 300)


def _oracle_n() -> int:
    """n_entities the er_* oracle SQL reads: the driver compares at
    sf0.01 (800); other harnesses (pytest parity gate, check_queries at
    another sf) override via GRAFT_ORACLE_N."""
    return int(os.environ.get("GRAFT_ORACLE_N", "800"))


def _oracle_corpus_path(n_entities: int) -> str:
    """Per-n corpus dir: concurrent runs at different scales (e.g. the
    sf0.001 pytest parity gate next to an sf0.01 check) must not
    overwrite each other's oracle inputs."""
    return f"/tmp/er_oracle_corpus_n{n_entities}/transcripts.parquet"


def _oracle_truth_path(n_entities: int) -> str:
    return f"/tmp/er_oracle_corpus_n{n_entities}/truth.parquet"


def _oracle_sf_dir() -> str:
    """sf dir the table-round-trip oracle paths are keyed by: the
    driver compares at sf0.01; other harnesses override via
    GRAFT_ORACLE_SF."""
    return os.environ.get("GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def _table_rows(sf_dir: str, table: str) -> int:
    """Row count from parquet metadata; 0 when the file is absent so
    oracle_sql() can always BUILD its dict (only the affected
    round-trip oracles would then point at an n0 path and fail, not
    every oracle)."""
    import pyarrow.parquet as pq

    try:
        return pq.ParquetFile(
            os.path.join(sf_dir, f"{table}.parquet")).metadata.num_rows
    except (FileNotFoundError, OSError):
        return 0


def _jsonl_events_path(n_rows: int) -> str:
    """JSONL landing zone the events_jsonl_stats query writes and its
    oracle reads — row-count-keyed so concurrent harnesses at different
    scales don't clobber each other (see _oracle_corpus_path)."""
    return f"/tmp/er_jsonl_events_n{n_rows}"


def _csv_customer_path(n_rows: int) -> str:
    return f"/tmp/er_csv_customer_n{n_rows}"


def _jsonl_parsed_path(n_rows: int) -> str:
    """Separate landing zone for the raw-text-parse query so it never
    races events_jsonl_stats over the same files."""
    return f"/tmp/er_jsonl_parsed_n{n_rows}"


def _range_parts_path(n_rows: int) -> str:
    """Range-partitioned landing zone (events_range_partition_stats)."""
    return f"/tmp/er_rangeparts_n{n_rows}"


def _schema_evo_path(n_rows: int) -> str:
    """Two-generation landing zone (events_schema_evolution)."""
    return f"/tmp/er_schemaevo_n{n_rows}"


def _partitioned_events_path(n_rows: int) -> str:
    return f"/tmp/er_part_events_n{n_rows}"


def _ivf_index_path(n_entities: int) -> str:
    """IVF index dir the ann_ivf_top10 query writes and its oracle
    reads — n-keyed like the er_* corpus so concurrent harnesses at
    different scales don't clobber each other (see _oracle_corpus_path)."""
    return f"/tmp/er_ivf_n{n_entities}"


def _kmeans_path(n_entities: int) -> str:
    """Centroid dir the embedding_kmeans_cells query writes and its
    oracle reads (n-keyed, same convention as _ivf_index_path)."""
    return f"/tmp/er_kmeans_n{n_entities}"


def _pca_path(n_entities: int) -> str:
    """Component dir the embedding_pca2 query writes and its oracle
    replays the projection from (model-as-input convention)."""
    return f"/tmp/er_pca_n{n_entities}"


def _bpe_vocab_path(n_entities: int) -> str:
    """Vocab dir the doc_token_ids query writes and its oracle joins
    against (model-as-input convention)."""
    return f"/tmp/er_bpe_vocab_n{n_entities}"


def _semdedup_index_path(n_entities: int) -> str:
    """k-means index dir the semdedup_* queries write and their oracles
    read (separate from _ivf_index_path: same layout, different build
    parameters)."""
    return f"/tmp/er_semdedup_n{n_entities}"


@lru_cache(maxsize=4)
def _write_oracle_corpus(n_entities: int):
    """Write the er_* corpus (transcripts + truth labels) to n-keyed
    parquet paths so the DuckDB oracles read the SAME data the Ray
    pipeline consumed.  Cached: every er_* query calls this and the
    synth is deterministic, so generate once per process."""
    import pyarrow.parquet as pq

    from aml_entity_resolution_assignment_ray.sources.synth import generate_corpus

    cpath = _oracle_corpus_path(n_entities)
    os.makedirs(os.path.dirname(cpath), exist_ok=True)
    transcripts, truth, _ = generate_corpus(
        n_entities=n_entities, seed=43, doppelganger_rate=0.0)
    pq.write_table(transcripts, cpath)
    pq.write_table(truth, _oracle_truth_path(n_entities))


def _round_half_away(x, decimals: int = 0):
    """Half-away-from-zero rounding (DuckDB round() ties) — shared
    implementation in util.round_half_away."""
    from aml_entity_resolution_assignment_ray.util import round_half_away

    return round_half_away(x, decimals)


@lru_cache(maxsize=4)
def _corpus(n_entities: int, seed: int = 43, doppelganger_rate: float = 0.0):
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.sources.synth import generate_corpus

    transcripts, truth, _ = generate_corpus(
        n_entities=n_entities, seed=seed, doppelganger_rate=doppelganger_rate)
    return rd.from_arrow(transcripts).materialize(), \
        rd.from_arrow(truth).materialize()


@lru_cache(maxsize=4)
def _flagship(n_entities: int):
    _tune_context()
    from aml_entity_resolution_assignment_ray.config import EngineConfig
    from aml_entity_resolution_assignment_ray.pipelines.flagship import run_flagship

    transcripts, truth = _corpus(n_entities)
    return run_flagship(transcripts, EngineConfig(), truth=truth)


# --------------------------------------------------------------------------
# contract
# --------------------------------------------------------------------------

def entry() -> Any:
    """Flagship ER pipeline at sf0.001 scale; returns the cluster map
    Dataset (conv_id, predicted_entity_id)."""
    return _flagship(150)["predictions"]


def queries() -> dict[str, Callable[[str], Any]]:
    from ray.data.aggregate import Count, Sum

    from aml_entity_resolution_assignment_ray.config import EngineConfig
    from aml_entity_resolution_assignment_ray.ops import ann, dedup, text
    from aml_entity_resolution_assignment_ray.util import safe_join

    # ---- TPC-H-ish relational operators (A1-A5, J-family, O1-O3) ----

    def lineitem_agg(sf_dir):
        _tune_context()
        ds = _read(sf_dir, "lineitem").select_columns(
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
             "l_discount"])
        g = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Sum("l_quantity"), Sum("l_extendedprice"), Sum("l_discount"),
            Count())

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                "sum_qty": _round_half_away(df["sum(l_quantity)"]).astype("int64"),
                "sum_price": _round_half_away(df["sum(l_extendedprice)"]).astype("int64"),
                "avg_disc": _round_half_away(df["sum(l_discount)"] / df["count()"], 4),
                "cnt": df["count()"].astype("int64"),
            })
            return out

        return g.map_batches(finalize, batch_format="pandas")

    def segment_revenue(sf_dir):
        _tune_context()
        cfg = EngineConfig()
        orders = _read(sf_dir, "orders").select_columns(
            ["o_custkey", "o_totalprice"])
        cust = _read(sf_dir, "customer").select_columns(
            ["c_custkey", "c_mktsegment"]).rename_columns(
            {"c_custkey": "o_custkey"})
        j = safe_join(orders, cust, join_type="inner",
                      num_partitions=cfg.resolve_join_partitions(),
                      on=("o_custkey",))
        g = j.groupby("c_mktsegment").aggregate(Sum("o_totalprice"), Count())

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "c_mktsegment": df["c_mktsegment"],
                "revenue": _round_half_away(df["sum(o_totalprice)"]).astype("int64"),
                "n_orders": df["count()"].astype("int64"),
            })

        return g.map_batches(finalize, batch_format="pandas")

    def nation_acctbal(sf_dir):
        _tune_context()
        cfg = EngineConfig()
        cust = _read(sf_dir, "customer").select_columns(
            ["c_nationkey", "c_acctbal"])
        nation = _read(sf_dir, "nation").select_columns(
            ["n_nationkey", "n_name"]).rename_columns(
            {"n_nationkey": "c_nationkey"})
        j = safe_join(cust, nation, join_type="inner",
                      num_partitions=cfg.resolve_join_partitions(),
                      on=("c_nationkey",))
        g = j.groupby("n_name").aggregate(Sum("c_acctbal"), Count())

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "n_name": df["n_name"],
                "avg_acctbal": _round_half_away(df["sum(c_acctbal)"] / df["count()"], 4),
                "n_customers": df["count()"].astype("int64"),
            })

        return g.map_batches(finalize, batch_format="pandas")

    def top_orders(sf_dir):
        _tune_context()
        return (
            _read(sf_dir, "orders")
            .select_columns(["o_orderkey", "o_totalprice"])
            .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
            .limit(10)
        )

    def cust_order_totals(sf_dir):
        """LEFT OUTER join + aggregate: every customer with their order
        count and lifetime spend in cents (0s for order-less customers).
        Money moves as exact integer cents so the running float sums
        are order-independent."""
        _tune_context()
        cfg = EngineConfig()
        cust = _read(sf_dir, "customer").select_columns(["c_custkey"])
        orders = _read(sf_dir, "orders").select_columns(
            ["o_custkey", "o_totalprice"])

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            t = pd.DataFrame({
                "c_custkey": df["o_custkey"],
                "cents": _round_half_away(df["o_totalprice"] * 100.0)
                .astype("int64"),
            })
            return t.groupby("c_custkey", as_index=False).agg(
                cents=("cents", "sum"), n=("cents", "size"))

        agg = orders.map_batches(partial, batch_format="pandas") \
            .groupby("c_custkey").aggregate(Sum("cents"), Sum("n"))
        j = safe_join(cust, agg, join_type="left_outer",
                      num_partitions=cfg.resolve_join_partitions(),
                      on=("c_custkey",))

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            zero = pd.Series(np.zeros(len(df)), index=df.index)
            n = df["sum(n)"] if "sum(n)" in df.columns else zero
            c = df["sum(cents)"] if "sum(cents)" in df.columns else zero
            return pd.DataFrame({
                "c_custkey": df["c_custkey"].astype("int64"),
                "n_orders": n.fillna(0).astype("int64"),
                "total_cents": c.fillna(0).astype("int64"),
            })

        return j.map_batches(finalize, batch_format="pandas")

    def cust_no_orders(sf_dir):
        """ANTI join: customers with no order above $400k (shuffle
        path: per-block distinct right keys -> left_outer +
        marker-null filter; ops/relational.anti_join)."""
        from aml_entity_resolution_assignment_ray.ops.relational import anti_join

        _tune_context()
        cfg = EngineConfig()
        cust = _read(sf_dir, "customer").select_columns(
            ["c_custkey", "c_name"])
        ok = _read(sf_dir, "orders") \
            .select_columns(["o_custkey", "o_totalprice"]) \
            .filter(expr="o_totalprice > 400000.0") \
            .select_columns(["o_custkey"]) \
            .rename_columns({"o_custkey": "c_custkey"})
        return anti_join(cust, ok, on=["c_custkey"], cfg=cfg)

    def incremental_event_counts(sf_dir):
        """Persisted streaming aggregate (ops/relational.
        incremental_keyed_sum): the events table ingested as three
        deterministic batches (event_id % 3) into an on-disk keyed-sum
        state — batch 0 deliberately REPLAYED (idempotent no-op) and
        the state COMPACTED mid-stream (manifest-excluded shards, fold
        value invariant) — then read back as per-type counts/totals.
        Each ingest persists only combiner partials (#keys rows); the
        oracle is the one-shot GROUP BY over the same events."""
        import shutil

        from aml_entity_resolution_assignment_ray.ops.relational import (
            compact_keyed_sum_state, incremental_keyed_sum,
            read_keyed_sum_state,
        )
        from aml_entity_resolution_assignment_ray.util import (
            round_half_away,
        )

        _tune_context()
        cfg = EngineConfig()
        sp = os.path.join("/tmp/graft_state",
                          f"inc_counts_{abs(hash(sf_dir)) % 10 ** 8}")
        shutil.rmtree(sp, ignore_errors=True)
        ev = _read(sf_dir, "events").select_columns(
            ["event_id", "event_type", "value"]).map_batches(
            lambda d: pd.DataFrame({
                "mod3": (d["event_id"].astype(np.int64) % 3),
                "event_type": d["event_type"].astype(str),
                "n_events": np.ones(len(d), dtype=np.int64),
                "total_cents": round_half_away(
                    d["value"].to_numpy() * 100).astype(np.int64)}),
            batch_format="pandas").materialize()
        for i in range(3):
            batch = ev.filter(expr=f"mod3 == {i}")
            incremental_keyed_sum(batch, sp, keys=["event_type"],
                                  val_cols=["n_events", "total_cents"],
                                  batch_id=f"b{i}", cfg=cfg)
            if i == 1:
                # replay (idempotent no-op) + compact mid-stream
                incremental_keyed_sum(
                    batch, sp, keys=["event_type"],
                    val_cols=["n_events", "total_cents"],
                    batch_id="b0", cfg=cfg)
                compact_keyed_sum_state(
                    sp, keys=["event_type"],
                    val_cols=["n_events", "total_cents"], cfg=cfg)
        return read_keyed_sum_state(sp, keys=["event_type"],
                                    val_cols=["n_events", "total_cents"],
                                    cfg=cfg)

    def fk_orphans(sf_dir):
        """Referential-integrity audit across the warehouse: for each
        declared FK edge, the exact count of orphan rows (child keys
        with no parent) — the data-quality gate a 100-TB ingest runs
        before joining.  Four ops/relational.anti_joins, each a
        broadcast-or-shuffle exists-filter over ONLY the key columns
        (payloads never move), folded to one tiny relation/count
        table.  events.user_id -> customer is the deliberately-broken
        edge in the synthetic data, so the audit returns real
        nonzero counts, not a vacuous all-zeros row."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            anti_join,
        )

        _tune_context()
        cfg = EngineConfig()

        def orphan_count(child, parent, col):
            return anti_join(child, parent, on=[col], cfg=cfg).count()

        li = _read(sf_dir, "lineitem").select_columns(["l_orderkey"]) \
            .rename_columns({"l_orderkey": "k"})
        ok = _read(sf_dir, "orders").select_columns(["o_orderkey"]) \
            .rename_columns({"o_orderkey": "k"})
        oc = _read(sf_dir, "orders").select_columns(["o_custkey"]) \
            .rename_columns({"o_custkey": "k"})
        ck = _read(sf_dir, "customer").select_columns(["c_custkey"]) \
            .rename_columns({"c_custkey": "k"})
        cn = _read(sf_dir, "customer").select_columns(["c_nationkey"]) \
            .rename_columns({"c_nationkey": "k"})
        nk = _read(sf_dir, "nation").select_columns(["n_nationkey"]) \
            .rename_columns({"n_nationkey": "k"})
        eu = _read(sf_dir, "events").select_columns(["user_id"]) \
            .rename_columns({"user_id": "k"})
        rows = [
            ("lineitem.l_orderkey->orders", orphan_count(li, ok, "k")),
            ("orders.o_custkey->customer", orphan_count(oc, ck, "k")),
            ("customer.c_nationkey->nation", orphan_count(cn, nk, "k")),
            ("events.user_id->customer", orphan_count(eu, ck, "k")),
        ]
        return pd.DataFrame({
            "fk_edge": [r[0] for r in rows],
            "n_orphans": np.asarray([r[1] for r in rows],
                                    dtype=np.int64)})

    def user_value_intervals(sf_dir):
        """SCD2-style validity intervals: each event's value becomes a
        row valid from its own ts until the user's NEXT event (NULL
        end on the last) — the slowly-changing-dimension build.
        ops/relational.grouped_lag with a negative offset (LEAD); one
        user-keyed shuffle, vectorized grouped shift, timestamps
        rendered to strings so the NULL-end contract is explicit."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            grouped_lag,
        )
        from aml_entity_resolution_assignment_ray.util import (
            round_half_away,
        )

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["event_id", "user_id", "ts", "value"])
        led = grouped_lag(ev, key="user_id", order_cols=["ts", "event_id"],
                          cols=["ts"], offset=-1, prefix="next_")

        def finalize(d: pd.DataFrame) -> pd.DataFrame:
            nxt = d["next_ts"]
            return pd.DataFrame({
                "event_id": d["event_id"].astype(np.int64),
                "user_id": d["user_id"].astype(np.int64),
                "value_cents": round_half_away(
                    d["value"].to_numpy() * 100).astype(np.int64),
                "ts_start": d["ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f"),
                "ts_end": nxt.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
                    .where(nxt.notna(), None),
            })

        return led.map_batches(finalize, batch_format="pandas")

    def cust_with_orders(sf_dir):
        """SEMI join (EXISTS): customers with at least one order above
        $400k, emitted once each no matter how many such orders exist
        (shuffle path: globally distinct right keys -> left_outer +
        marker filter; ops/relational.semi_join)."""
        from aml_entity_resolution_assignment_ray.ops.relational import semi_join

        _tune_context()
        cfg = EngineConfig()
        cust = _read(sf_dir, "customer").select_columns(
            ["c_custkey", "c_name"])
        ok = _read(sf_dir, "orders") \
            .select_columns(["o_custkey", "o_totalprice"]) \
            .filter(expr="o_totalprice > 400000.0") \
            .select_columns(["o_custkey"]) \
            .rename_columns({"o_custkey": "c_custkey"})
        return semi_join(cust, ok, on=["c_custkey"], cfg=cfg)

    def cust_running_revenue(sf_dir):
        """Cumulative-sum window (sum OVER (PARTITION BY customer ORDER
        BY date, key)): ops/relational.grouped_running_sum — one keyed
        shuffle + per-block grouped cumsum over exact integer cents."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            grouped_running_sum)

        _tune_context()
        cfg = EngineConfig()
        orders = _read(sf_dir, "orders").select_columns(
            ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "o_custkey": df["o_custkey"],
                "o_orderkey": df["o_orderkey"],
                "o_orderdate": df["o_orderdate"],
                "cents": _round_half_away(df["o_totalprice"] * 100.0)
                .astype("int64"),
            })

        run = grouped_running_sum(
            orders.map_batches(prep, batch_format="pandas"),
            key="o_custkey", order_cols=["o_orderdate", "o_orderkey"],
            val_col="cents", out_col="run_cents", cfg=cfg)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "o_custkey": df["o_custkey"].astype("int64"),
                "o_orderkey": df["o_orderkey"].astype("int64"),
                "run_cents": df["run_cents"].astype("int64"),
            })

        return run.map_batches(finalize, batch_format="pandas")

    def nation_revenue_q5(sf_dir):
        """TPC-H Q5 shape — revenue per nation for orders placed in
        1995 where the supplier and customer share a nation inside one
        region: the multi-way join benchmark of the relational surface.

        Ray-first plan: the CONSTANT-SIZE dims (region, nation: 5/25
        rows at any SF) fold to driver dicts; the supplier->nation map
        (SF x 10k rows, a few MB of int pairs even at SF 100k)
        broadcasts ONCE via ray.put and attaches inside a stateful
        map kernel — never a shuffle; the two data-scale joins
        (orders x customer on custkey, lineitem x the result on
        orderkey) are hash joins; revenue moves as exact integer
        cent-x-percent units so the final keyed_sum is
        layout-invariant."""
        import ray

        from aml_entity_resolution_assignment_ray.ops.relational import keyed_sum
        from aml_entity_resolution_assignment_ray.util import stateful_map

        _tune_context()
        cfg = EngineConfig()
        nparts = cfg.resolve_join_partitions()

        nat = _read(sf_dir, "nation").to_pandas()
        reg = _read(sf_dir, "region").to_pandas()
        region_keys = set(
            reg.loc[reg["r_name"] == "ASIA", "r_regionkey"].astype(int))
        nmap = {int(k): str(v) for k, v, rk in zip(
            nat["n_nationkey"], nat["n_name"], nat["n_regionkey"])
            if int(rk) in region_keys}
        nkeys = frozenset(nmap)
        sup = _read(sf_dir, "supplier").select_columns(
            ["s_suppkey", "s_nationkey"]).to_pandas()
        smap_ref = ray.put(dict(zip(sup["s_suppkey"].astype(int),
                                    sup["s_nationkey"].astype(int))))

        def cust_prep(df: pd.DataFrame) -> pd.DataFrame:
            d = df[df["c_nationkey"].isin(nkeys)]
            return pd.DataFrame({
                "custkey": d["c_custkey"].astype(np.int64),
                "c_nationkey": d["c_nationkey"].astype(np.int64),
            })

        cust = _read(sf_dir, "customer").select_columns(
            ["c_custkey", "c_nationkey"]) \
            .map_batches(cust_prep, batch_format="pandas")

        def order_prep(df: pd.DataFrame) -> pd.DataFrame:
            m = ((df["o_orderdate"] >= pd.Timestamp("1995-01-01"))
                 & (df["o_orderdate"] < pd.Timestamp("1996-01-01")))
            d = df[m]
            return pd.DataFrame({
                "orderkey": d["o_orderkey"].astype(np.int64),
                "custkey": d["o_custkey"].astype(np.int64),
            })

        orders = _read(sf_dir, "orders").select_columns(
            ["o_orderkey", "o_custkey", "o_orderdate"]) \
            .map_batches(order_prep, batch_format="pandas")
        oc = safe_join(orders, cust, join_type="inner",
                       num_partitions=nparts, on=("custkey",)) \
            .map_batches(lambda d: d[["orderkey", "c_nationkey"]],
                         batch_format="pandas")

        def line_prep(df: pd.DataFrame) -> pd.DataFrame:
            cents = _round_half_away(
                df["l_extendedprice"] * 100.0).astype(np.int64)
            disc_pct = _round_half_away(
                df["l_discount"] * 100.0).astype(np.int64)
            return pd.DataFrame({
                "orderkey": df["l_orderkey"].astype(np.int64),
                "suppkey": df["l_suppkey"].astype(np.int64),
                "rev_units": cents * (100 - disc_pct),
            })

        class AttachSupplierNation:
            """supplier->nation broadcast lookup, fetched from the
            object store once per worker (stateful_map)."""

            def __init__(self, ref):
                self.smap = ray.get(ref)

            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                out = df[["orderkey", "rev_units"]].copy()
                out["s_nationkey"] = df["suppkey"].map(self.smap) \
                    .astype(np.int64)
                return out

        li = _read(sf_dir, "lineitem").select_columns(
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]) \
            .map_batches(line_prep, batch_format="pandas")
        li = stateful_map(li, AttachSupplierNation, (smap_ref,),
                          batch_format="pandas")

        lo = safe_join(li, oc, join_type="inner",
                       num_partitions=nparts, on=("orderkey",))

        def local_only(df: pd.DataFrame) -> pd.DataFrame:
            d = df[df["s_nationkey"] == df["c_nationkey"]]
            return pd.DataFrame({
                "nationkey": d["s_nationkey"].astype(np.int64),
                "revenue_units": d["rev_units"].astype(np.int64),
            })

        agg = keyed_sum(lo.map_batches(local_only, batch_format="pandas"),
                        ["nationkey"], ["revenue_units"])

        def name_it(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "n_name": df["nationkey"].map(nmap),
                "revenue_units": df["revenue_units"].astype(np.int64),
            })

        return agg.map_batches(name_it, batch_format="pandas")

    def high_value_click_events(sf_dir):
        """Filter PUSHED INTO THE READ: the predicate goes to
        read_parquet as a pyarrow dataset expression, so row groups
        whose column statistics exclude it are never fetched and
        non-matching rows never enter the object store — at 100 TB the
        scan is the filter.  (The streaming ds.filter(expr=...) form
        is equivalent post-read; this is the prune-at-the-source
        variant.)"""
        import pyarrow.dataset as pds
        import ray.data as rd

        _tune_context()
        ds = rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "event_type", "value"],
            filter=(pds.field("event_type") == "click")
            & (pds.field("value") > 50.0))
        return ds.select_columns(["event_id", "value"])

    def event_type_stats(sf_dir):
        _tune_context()
        g = _read(sf_dir, "events").select_columns(["event_type", "value"]) \
            .groupby("event_type").aggregate(Sum("value"), Count())

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_type": df["event_type"],
                "total_value": _round_half_away(df["sum(value)"], 2),
                "n_events": df["count()"].astype("int64"),
            })

        return g.map_batches(finalize, batch_format="pandas")

    def events_jsonl_stats(sf_dir):
        """Text-format ingest: events round-trip through newline-
        delimited JSON shards (sources/files.export_jsonl ->
        rd.read_json streams the files as blocks like parquet), then
        the per-type aggregate runs over the JSONL-read Dataset.
        Values are exported as integer cents so the sum is exact both
        sides; the oracle reads the SAME files via read_json_auto."""
        from aml_entity_resolution_assignment_ray.sources import files as fsrc

        _tune_context()
        path = _jsonl_events_path(_table_rows(sf_dir, "events"))
        src = _read(sf_dir, "events").select_columns(
            ["event_id", "event_type", "value"])

        def to_cents(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_id": df["event_id"].astype("int64"),
                "event_type": df["event_type"],
                "value_cents": np.rint(
                    df["value"].to_numpy() * 100).astype("int64"),
            })

        fsrc.export_jsonl(
            src.map_batches(to_cents, batch_format="pandas"), path)
        g = fsrc.read_jsonl(path).groupby("event_type") \
            .aggregate(Sum("value_cents"), Count())

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_type": df["event_type"],
                "total_cents": df["sum(value_cents)"].astype("int64"),
                "n_events": df["count()"].astype("int64"),
            })

        return g.map_batches(finalize, batch_format="pandas")

    def events_jsonl_parsed(sf_dir):
        """Schema-on-read ingest (sources/files.read_jsonl_lines): the
        SAME JSONL landing-zone layout as events_jsonl_stats, but read
        back as RAW TEXT LINES and parsed with the stdlib JSON parser
        (the quarantine path that drops bad lines instead of rejecting
        files); per-type aggregate over the parsed Dataset.  Oracle
        reads the same files with read_json_auto."""
        from aml_entity_resolution_assignment_ray.sources import files as fsrc

        _tune_context()
        path = _jsonl_parsed_path(_table_rows(sf_dir, "events"))
        src = _read(sf_dir, "events").select_columns(
            ["event_id", "event_type", "value"])

        def to_cents(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_id": df["event_id"].astype("int64"),
                "event_type": df["event_type"],
                "value_cents": np.rint(
                    df["value"].to_numpy() * 100).astype("int64"),
            })

        fsrc.export_jsonl(
            src.map_batches(to_cents, batch_format="pandas"), path)
        parsed = fsrc.read_jsonl_lines(
            path, {"event_type": "str", "value_cents": "int64"})
        g = parsed.groupby("event_type") \
            .aggregate(Sum("value_cents"), Count())

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_type": df["event_type"],
                "total_cents": df["sum(value_cents)"].astype("int64"),
                "n_events": df["count()"].astype("int64"),
            })

        return g.map_batches(finalize, batch_format="pandas")

    def events_partitioned_stats(sf_dir):
        """Hive-partitioned parquet sink + physically pruned read:
        events are written one directory per event_type
        (sources/files.export_partitioned_parquet — the resumable
        100-TB output layout), then ONLY the 'click' partition
        directory is read back and aggregated; the oracle reads the
        same partition's files."""
        from aml_entity_resolution_assignment_ray.sources import files as fsrc

        _tune_context()
        path = _partitioned_events_path(_table_rows(sf_dir, "events"))
        src = _read(sf_dir, "events").select_columns(
            ["event_id", "event_type", "value"])

        def to_cents(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_id": df["event_id"].astype("int64"),
                "event_type": df["event_type"],
                "value_cents": np.rint(
                    df["value"].to_numpy() * 100).astype("int64"),
            })

        fsrc.export_partitioned_parquet(
            src.map_batches(to_cents, batch_format="pandas"), path,
            partition_cols=["event_type"])
        clicks = fsrc.read_partition(path, "event_type", "click")
        g = clicks.groupby("event_type") \
            .aggregate(Sum("value_cents"), Count())

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_type": df["event_type"],
                "total_cents": df["sum(value_cents)"].astype("int64"),
                "n_events": df["count()"].astype("int64"),
            })

        return g.map_batches(finalize, batch_format="pandas")

    def events_range_partition_stats(sf_dir):
        """Numeric RANGE-partitioned sink + pruned read
        (sources/files.range_bucket + export_partitioned_parquet):
        events write one directory per value-cents range bucket
        (boundaries 2500/5000/7500), then ONLY the (2500, 5000]
        bucket's directory is read back and aggregated — directory-
        level pruning on a numeric range, the sibling of the
        categorical hive path.  Oracle reads the same partition's
        files."""
        from aml_entity_resolution_assignment_ray.sources import files as fsrc

        _tune_context()
        path = _range_parts_path(_table_rows(sf_dir, "events"))
        src = _read(sf_dir, "events").select_columns(
            ["event_id", "value"]).map_batches(
            lambda d: pd.DataFrame({
                "event_id": d["event_id"].astype("int64"),
                "cents": _round_half_away(
                    d["value"].to_numpy(np.float64) * 100)
                .astype(np.int64)}),
            batch_format="pandas")
        tagged = fsrc.range_bucket(src, col="cents",
                                   boundaries=[2500, 5000, 7500])
        fsrc.export_partitioned_parquet(tagged, path,
                                        partition_cols=["bucket"])
        part = fsrc.read_partition(path, "bucket", 1)

        def agg(df: pd.DataFrame) -> pd.DataFrame:
            c = df["cents"].to_numpy(np.int64)
            return pd.DataFrame({
                "n": [np.int64(len(c))],
                "total_cents": [np.int64(c.sum())],
                "min_cents": [np.int64(c.min())],
                "max_cents": [np.int64(c.max())],
            })

        g = part.map_batches(agg, batch_format="pandas").repartition(1)

        def final(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "n": [np.int64(df["n"].sum())],
                "total_cents": [np.int64(df["total_cents"].sum())],
                "min_cents": [np.int64(df["min_cents"].min())],
                "max_cents": [np.int64(df["max_cents"].max())],
            })

        return g.map_batches(final, batch_format="pandas",
                             batch_size=None)

    def events_schema_evolution(sf_dir):
        """Schema-evolution ingest (sources/files.union_by_name): two
        parquet generations — the old writer's (event_id, event_type)
        and the new writer's with an added value_cents column — union
        by NAME with NULL fill, then a per-type aggregate counting how
        many rows actually carry the new column.  Oracle: DuckDB's
        own read_parquet(union_by_name=true) over the same files."""
        from aml_entity_resolution_assignment_ray.sources import files as fsrc

        _tune_context()
        path = _schema_evo_path(_table_rows(sf_dir, "events"))
        src = _read(sf_dir, "events").select_columns(
            ["event_id", "event_type", "value"])

        def gen1(d: pd.DataFrame) -> pd.DataFrame:
            h = d[d["event_id"] % 2 == 0]
            return pd.DataFrame({
                "event_id": h["event_id"].astype("int64"),
                "event_type": h["event_type"]})

        def gen2(d: pd.DataFrame) -> pd.DataFrame:
            h = d[d["event_id"] % 2 == 1]
            return pd.DataFrame({
                "event_id": h["event_id"].astype("int64"),
                "event_type": h["event_type"],
                "value_cents": np.rint(
                    h["value"].to_numpy() * 100).astype("int64")})

        import shutil

        shutil.rmtree(path, ignore_errors=True)
        src.map_batches(gen1, batch_format="pandas") \
            .write_parquet(os.path.join(path, "gen1"))
        src.map_batches(gen2, batch_format="pandas") \
            .write_parquet(os.path.join(path, "gen2"))
        import ray.data as rd

        u = fsrc.union_by_name([
            rd.read_parquet(os.path.join(path, "gen1")),
            rd.read_parquet(os.path.join(path, "gen2"))])

        def partial(d: pd.DataFrame) -> pd.DataFrame:
            v = d["value_cents"]
            return pd.DataFrame({
                "event_type": d["event_type"],
                "n_events": np.ones(len(d), dtype=np.int64),
                "n_with_value": v.notna().to_numpy().astype(np.int64),
                "total_cents": v.fillna(0).to_numpy(dtype=np.int64),
            })

        from aml_entity_resolution_assignment_ray.ops.relational import keyed_sum

        out = keyed_sum(u.map_batches(partial, batch_format="pandas"),
                        ["event_type"],
                        ["n_events", "n_with_value", "total_cents"])

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_type": df["event_type"],
                "n_events": df["n_events"].astype("int64"),
                "n_with_value": df["n_with_value"].astype("int64"),
                "total_cents": df["total_cents"].astype("int64"),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def customer_csv_stats(sf_dir):
        """Text-format ingest: customer round-trips through headered
        CSV shards (sources/files.export_csv -> rd.read_csv), then a
        per-segment aggregate runs over the CSV-read Dataset; acctbal
        exported as integer cents for exact-sum parity."""
        from aml_entity_resolution_assignment_ray.sources import files as fsrc

        _tune_context()
        path = _csv_customer_path(_table_rows(sf_dir, "customer"))
        src = _read(sf_dir, "customer").select_columns(
            ["c_custkey", "c_mktsegment", "c_acctbal"])

        def to_cents(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "c_custkey": df["c_custkey"].astype("int64"),
                "c_mktsegment": df["c_mktsegment"],
                "acctbal_cents": np.rint(
                    df["c_acctbal"].to_numpy() * 100).astype("int64"),
            })

        fsrc.export_csv(
            src.map_batches(to_cents, batch_format="pandas"), path)
        g = fsrc.read_csv(path).groupby("c_mktsegment") \
            .aggregate(Sum("acctbal_cents"), Count())

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "c_mktsegment": df["c_mktsegment"],
                "total_acctbal_cents":
                    df["sum(acctbal_cents)"].astype("int64"),
                "n_customers": df["count()"].astype("int64"),
            })

        return g.map_batches(finalize, batch_format="pandas")

    def event_zscores(sf_dir):
        """Per-type standardization of event values (z-scores; the
        grouped outlier/anomaly primitive — ops/relational.
        grouped_zscore: combiner-reduced stats, hash-join attach)."""
        from aml_entity_resolution_assignment_ray.ops.relational import grouped_zscore

        _tune_context()
        out = grouped_zscore(
            _read(sf_dir, "events").select_columns(
                ["event_id", "event_type", "value"]),
            key="event_type", col="value", keep_cols=["event_id"])

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_id": df["event_id"].astype("int64"),
                "event_type": df["event_type"],
                "zscore": _round_half_away(df["zscore"], 6),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def hourly_user_events(sf_dir):
        """Tumbling-window (1h) count per user — the windowed-aggregate
        pattern as derive-window-key + groupby."""
        _tune_context()
        ds = _read(sf_dir, "events").select_columns(["user_id", "ts"])

        # (user, hour) key cardinality is unbounded -> the keyed_sum
        # combiner shape, not Ray's native groupby (see keyed_sum)
        from aml_entity_resolution_assignment_ray.ops.relational import keyed_sum

        def add_hour(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "user_id": df["user_id"],
                "hour": df["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:%M:%S"),
                "n_events": np.ones(len(df), dtype=np.int64),
            })

        return keyed_sum(ds.map_batches(add_hour, batch_format="pandas"),
                         ["user_id", "hour"], ["n_events"])

    def event_rollup(sf_dir):
        """SQL ROLLUP over (event_type, hour): event counts and exact
        value cents at every prefix level with NULL-marked rolled
        columns (ops/relational.rollup_sum — cascading combiners, one
        input scan, shuffle volume = sum of level cardinalities)."""
        from aml_entity_resolution_assignment_ray.ops.relational import rollup_sum

        _tune_context()
        ds = _read(sf_dir, "events").select_columns(
            ["event_type", "ts", "value"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_type": df["event_type"],
                "hour": df["ts"].dt.floor("h")
                .dt.strftime("%Y-%m-%d %H:%M:%S"),
                "n_events": np.ones(len(df), dtype=np.int64),
                "total_cents": _round_half_away(
                    df["value"].to_numpy(dtype=np.float64) * 100)
                .astype(np.int64),
            })

        return rollup_sum(ds.map_batches(prep, batch_format="pandas"),
                          keys=["event_type", "hour"],
                          val_cols=["n_events", "total_cents"])

    def user_event_pivot(sf_dir):
        """Pivot to wide per-user event-type counts (ops/relational.
        pivot_counts — per-batch crosstab partials, one keyed_sum)."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            pivot_counts,
        )

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["user_id", "event_type"])
        return pivot_counts(ev, key="user_id", pivot_col="event_type",
                            values=["click", "error", "purchase",
                                    "signup", "view"])

    def distinct_event_types(sf_dir):
        _tune_context()
        return _read(sf_dir, "events").select_columns(["event_type"]) \
            .groupby("event_type").count().select_columns(["event_type"])

    def events_profile_numeric(sf_dir):
        """Per-column dataset profile over the events table's integer
        columns (ops/profile.dataset_profile): row/NULL counts, min,
        max, exact int64 sum.  Pure per-block combiner — one tiny row
        per block per column, no shuffle, no float accumulation."""
        from aml_entity_resolution_assignment_ray.ops.profile import (
            dataset_profile,
        )

        _tune_context()
        ds = _read(sf_dir, "events").select_columns(
            ["event_id", "user_id", "value"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_id": df["event_id"].astype(np.int64),
                "user_id": df["user_id"].astype(np.int64),
                "value_cents": _round_half_away(
                    df["value"].to_numpy(dtype=np.float64) * 100)
                .astype(np.int64),
            })

        prof = dataset_profile(
            ds.map_batches(prep, batch_format="pandas"),
            int_cols=["event_id", "user_id", "value_cents"])
        return prof.map_batches(
            lambda d: d[["column", "n_rows", "n_null", "min_num",
                         "max_num", "sum_int"]]
            .rename(columns={"column": "col_name"}),
            batch_format="pandas")

    def events_profile_strings(sf_dir):
        """String-column profile over events (ops/profile.
        dataset_profile): row/NULL counts and binary-collation
        min/max."""
        from aml_entity_resolution_assignment_ray.ops.profile import (
            dataset_profile,
        )

        _tune_context()
        ds = _read(sf_dir, "events").select_columns(
            ["event_type", "props"])
        prof = dataset_profile(ds, str_cols=["event_type", "props"])
        return prof.map_batches(
            lambda d: d[["column", "n_rows", "n_null", "min_str",
                         "max_str"]]
            .rename(columns={"column": "col_name"}),
            batch_format="pandas")

    def event_value_histogram(sf_dir):
        """Sparse fixed-width histogram of event value (10-dollar
        bins over exact integer cents; ops/profile.binned_histogram —
        per-block bincount partials, one keyed_sum bounded by occupied
        bins)."""
        from aml_entity_resolution_assignment_ray.ops.profile import (
            binned_histogram,
        )

        _tune_context()
        ds = _read(sf_dir, "events").select_columns(["value"])

        def cents(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "cents": _round_half_away(
                    df["value"].to_numpy(dtype=np.float64) * 100)
                .astype(np.int64),
            })

        return binned_histogram(
            ds.map_batches(cents, batch_format="pandas"),
            col="cents", bin_width=1000)

    def event_value_equidepth(sf_dir):
        """Equi-depth histogram of event value cents
        (ops/profile.equidepth_histogram): 8 quantile-disc buckets,
        bucket = smallest boundary covering the value, exact integer
        counts."""
        from aml_entity_resolution_assignment_ray.ops.profile import (
            equidepth_histogram,
        )

        _tune_context()
        ds = _read(sf_dir, "events").select_columns(["value"])

        def cents(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "cents": _round_half_away(
                    df["value"].to_numpy(dtype=np.float64) * 100)
                .astype(np.int64),
            })

        out = equidepth_histogram(
            ds.map_batches(cents, batch_format="pandas"),
            col="cents", nbins=8)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "bucket": df["bucket"].astype("int64"),
                "hi": df["hi"].astype("int64"),
                "n": df["n"].astype("int64"),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def late_events(sf_dir):
        """Event-time watermark check (ops/events.
        watermark_late_events): arrival order = a user-partition-
        merged replay (user_id, then event_id) — the realistic shape
        where per-partition streams are time-sorted but the merged
        stream is not, so event time genuinely jumps backwards at
        partition boundaries.  Watermark = strict-prefix max event
        time minus 7 days, exact integer MICROSECONDS on both sides
        (DuckDB epoch() is fractional and CAST rounds — epoch_us is
        the exact contract); flags arrivals behind the watermark and
        by how much.  Two-level distributed prefix max — no global
        sort.  At sf0.001: 745 late / 255 on-time, so both branches
        are exercised."""
        from aml_entity_resolution_assignment_ray.ops.events import (
            watermark_late_events,
        )

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["event_id", "user_id", "ts"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            eid = df["event_id"].to_numpy(dtype=np.int64)
            uid = df["user_id"].to_numpy(dtype=np.int64)
            return pd.DataFrame({
                "event_id": eid,
                "seq": uid * 10 ** 9 + eid,
                "bucket": uid,
                "tus": (df["ts"].astype("datetime64[ns]").astype("int64")
                        // 1000).astype(np.int64),
            })

        out = watermark_late_events(
            ev.map_batches(prep, batch_format="pandas"),
            bucket_col="bucket", seq_col="seq", ts_col="tus",
            lateness=7 * 86400 * 10 ** 6)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_id": df["event_id"].astype("int64"),
                "late_by_us": df["late_by"].astype("int64"),
                "is_late": df["is_late"].astype(bool),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def global_revenue_running(sf_dir):
        """GLOBAL running revenue over all events ordered by
        (ts, event_id) — sum() OVER (ORDER BY ...) without a
        single-node sort (ops/events.global_running_sum): per-block
        per-hour partial sums give the driver exclusive hour offsets
        (bounded by #hours), then one hash repartition on the hour and
        a per-block cumsum + offset.  Exact integer cents."""
        from aml_entity_resolution_assignment_ray.ops.events import (
            global_running_sum,
        )

        _tune_context()
        ds = _read(sf_dir, "events").select_columns(
            ["event_id", "ts", "value"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_id": df["event_id"].astype(np.int64),
                "ts_us": df["ts"].to_numpy(dtype="datetime64[us]")
                .astype(np.int64),
                "hour": df["ts"].dt.floor("h")
                .to_numpy(dtype="datetime64[us]").astype(np.int64),
                "cents": _round_half_away(
                    df["value"].to_numpy(dtype=np.float64) * 100)
                .astype(np.int64),
            })

        run = global_running_sum(
            ds.map_batches(prep, batch_format="pandas"),
            bucket_col="hour", order_cols=["ts_us", "event_id"],
            val_col="cents", out_col="running_cents")
        return run.map_batches(
            lambda d: d[["event_id", "running_cents"]],
            batch_format="pandas")

    def event_value_outliers(sf_dir):
        """Robust per-type outlier flags via Median Absolute Deviation
        over exact integer cents (ops/profile.mad_outliers — one keyed
        shuffle, discrete medians matching quantile_disc)."""
        from aml_entity_resolution_assignment_ray.ops.profile import (
            mad_outliers,
        )

        _tune_context()
        ds = _read(sf_dir, "events").select_columns(
            ["event_id", "event_type", "value"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_id": df["event_id"].astype(np.int64),
                "event_type": df["event_type"],
                "cents": _round_half_away(
                    df["value"].to_numpy(dtype=np.float64) * 100)
                .astype(np.int64),
            })

        return mad_outliers(ds.map_batches(prep, batch_format="pandas"),
                            key="event_type", col="cents", mult=3)

    def hourly_top_types(sf_dir):
        """Top-2 event types per hour with rank — keyed_sum counts into
        group_topk (the per-block-partial-top-k combiner), a two-
        primitive composition."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            group_topk,
            keyed_sum,
        )

        _tune_context()
        ds = _read(sf_dir, "events").select_columns(["event_type", "ts"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "hour": df["ts"].dt.floor("h")
                .dt.strftime("%Y-%m-%d %H:%M:%S"),
                "event_type": df["event_type"],
                "n": np.ones(len(df), dtype=np.int64),
            })

        counts = keyed_sum(ds.map_batches(prep, batch_format="pandas"),
                           ["hour", "event_type"], ["n"])
        return group_topk(counts, key="hour", order_col="n", k=2,
                          tie_col="event_type", with_rank=True)

    def new_users_per_hour(sf_dir):
        """First-touch attribution: each user's FIRST hour (keyed_reduce
        min — an order-free combiner), new-user counts per hour
        (keyed_sum), and the cumulative user base over time
        (global_running_sum's two-level prefix sum, day buckets) — a
        three-primitive composition, each stage one bounded shuffle or
        less."""
        from aml_entity_resolution_assignment_ray.ops.events import (
            global_running_sum,
        )
        from aml_entity_resolution_assignment_ray.ops.relational import (
            keyed_reduce,
            keyed_sum,
        )

        _tune_context()
        ds = _read(sf_dir, "events").select_columns(["user_id", "ts"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "user_id": df["user_id"].astype(np.int64),
                "hour_us": df["ts"].dt.floor("h")
                .to_numpy(dtype="datetime64[us]").astype(np.int64),
            })

        first = keyed_reduce(ds.map_batches(prep, batch_format="pandas"),
                             ["user_id"], ["hour_us"], how="min")
        counts = keyed_sum(first.map_batches(
            lambda d: pd.DataFrame({
                "hour_us": d["hour_us"].astype(np.int64),
                "n_new": np.ones(len(d), dtype=np.int64)}),
            batch_format="pandas"), ["hour_us"], ["n_new"])
        day_us = 86_400_000_000

        def bucketed(d: pd.DataFrame) -> pd.DataFrame:
            out = d.copy()
            out["day"] = out["hour_us"].to_numpy(np.int64) // day_us
            return out

        run = global_running_sum(
            counts.map_batches(bucketed, batch_format="pandas"),
            bucket_col="day", order_cols=["hour_us"], val_col="n_new",
            out_col="cum_users")

        def finalize(d: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "hour": pd.to_datetime(d["hour_us"].to_numpy(np.int64),
                                       unit="us")
                .strftime("%Y-%m-%d %H:%M:%S"),
                "n_new": d["n_new"].astype(np.int64),
                "cum_users": d["cum_users"].astype(np.int64),
            })

        return run.map_batches(finalize, batch_format="pandas")

    def user_retention(sf_dir):
        """Cohort retention triangle: users cohorted by their first
        active hour, distinct-user counts per (cohort, hours-since-
        cohort) cell (ops/events.retention_cohorts — distinct-pair
        combiner, first-touch keyed_reduce(min), ONE user-keyed hash
        join, keyed_sum; exact integers end to end)."""
        from aml_entity_resolution_assignment_ray.ops.events import (
            retention_cohorts,
        )

        _tune_context()
        ds = _read(sf_dir, "events").select_columns(["user_id", "ts"])
        hour_us = 3_600_000_000

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "user_id": df["user_id"].astype(np.int64),
                "hour": df["ts"].dt.floor("h")
                .to_numpy(dtype="datetime64[us]").astype(np.int64)
                // hour_us,
            })

        res = retention_cohorts(
            ds.map_batches(prep, batch_format="pandas"),
            user_col="user_id", bucket_col="hour")

        def finalize(d: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "cohort_hour": pd.to_datetime(
                    d["cohort"].to_numpy(np.int64) * hour_us, unit="us")
                .strftime("%Y-%m-%d %H:%M:%S"),
                "offset_hours": d["offset"].astype(np.int64),
                "n_users": d["n_users"].astype(np.int64),
            })

        return res.map_batches(finalize, batch_format="pandas")

    def user_value_window_sum(sf_dir):
        """Bounded-frame sliding window: each event's trailing-4-row
        spend per user (ops/relational.grouped_frame_sum — grouped
        cumsum minus its window-shifted self, exact int64; ONE user
        shuffle, O(rows) per block whatever the frame width)."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            grouped_frame_sum,
        )

        _tune_context()
        ds = _read(sf_dir, "events").select_columns(
            ["user_id", "event_id", "ts", "value"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "user_id": df["user_id"].astype(np.int64),
                "event_id": df["event_id"].astype(np.int64),
                "ts_us": df["ts"].to_numpy(dtype="datetime64[us]")
                .astype(np.int64),
                "cents": _round_half_away(
                    df["value"].to_numpy(np.float64) * 100)
                .astype(np.int64),
            })

        res = grouped_frame_sum(
            ds.map_batches(prep, batch_format="pandas"),
            key="user_id", order_cols=["ts_us", "event_id"],
            val_col="cents", preceding=3, out_col="win_cents")
        return res.map_batches(
            lambda d: pd.DataFrame({
                "user_id": d["user_id"].astype(np.int64),
                "event_id": d["event_id"].astype(np.int64),
                "win_cents": d["win_cents"].astype(np.int64)}),
            batch_format="pandas")

    def event_type_jaccard(sf_dir):
        """Pairwise Jaccard similarity between event types by shared
        users (ops/profile.cooccurrence_jaccard — distinct-pair
        combiner, block-local self-merge per user, keyed_sum; exact
        integer overlaps, one exact float division at the end)."""
        from aml_entity_resolution_assignment_ray.ops.profile import (
            cooccurrence_jaccard,
        )

        _tune_context()
        ds = _read(sf_dir, "events").select_columns(
            ["user_id", "event_type"]).map_batches(
            lambda d: pd.DataFrame({
                "user_id": d["user_id"].astype(np.int64),
                "event_type": d["event_type"]}),
            batch_format="pandas")
        return cooccurrence_jaccard(ds, set_col="user_id",
                                    item_col="event_type")

    def event_value_winsorized(sf_dir):
        """Per-type winsorization: event cents clamped to the exact
        [p05, p95] discrete quantiles of their event type
        (ops/relational.grouped_winsorize — quantile-count combiner,
        ONE key join, stateless clamp; bounds are actual group
        elements so everything stays int64)."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            grouped_winsorize,
        )

        _tune_context()
        ds = _read(sf_dir, "events").select_columns(
            ["event_id", "event_type", "value"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_id": df["event_id"].astype(np.int64),
                "event_type": df["event_type"],
                "cents": _round_half_away(
                    df["value"].to_numpy(np.float64) * 100)
                .astype(np.int64),
            })

        return grouped_winsorize(
            ds.map_batches(prep, batch_format="pandas"),
            key="event_type", col="cents", q_lo=0.05, q_hi=0.95)

    def user_funnel(sf_dir):
        """Ordered click -> signup -> purchase funnel per user
        (ops/events.funnel_conversion): one user shuffle, a vectorized
        groupby-min pass per step with strict-after ordering — how
        many steps each user completed in sequence."""
        from aml_entity_resolution_assignment_ray.ops.events import (
            funnel_conversion,
        )

        _tune_context()
        ds = _read(sf_dir, "events").select_columns(
            ["user_id", "ts", "event_type"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "user_id": df["user_id"].astype(np.int64),
                "ts_us": df["ts"].to_numpy(dtype="datetime64[us]")
                .astype(np.int64),
                "event_type": df["event_type"],
            })

        return funnel_conversion(
            ds.map_batches(prep, batch_format="pandas"),
            key="user_id", ts_col="ts_us", step_col="event_type",
            steps=["click", "signup", "purchase"])

    def hourly_distinct_users(sf_dir):
        """EXACT distinct users per hour (ops/profile.
        grouped_distinct_count — per-block dedup partials, one keyed
        shuffle; the exact sibling of hourly_approx_users' KMV
        sketch)."""
        from aml_entity_resolution_assignment_ray.ops.profile import (
            grouped_distinct_count,
        )

        _tune_context()
        ds = _read(sf_dir, "events").select_columns(["user_id", "ts"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "hour": df["ts"].dt.floor("h")
                .dt.strftime("%Y-%m-%d %H:%M:%S"),
                "user_id": df["user_id"].astype(np.int64),
            })

        return grouped_distinct_count(
            ds.map_batches(prep, batch_format="pandas"),
            key="hour", col="user_id")

    def user_event_entropy(sf_dir):
        """Shannon entropy (nats) of each user's event-type mix
        (ops/profile.grouped_entropy — exact integer counts through
        the shuffle, one float expression at the end)."""
        from aml_entity_resolution_assignment_ray.ops.profile import (
            grouped_entropy,
        )

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["user_id", "event_type"])
        return grouped_entropy(ev, key="user_id", col="event_type")

    def user_top_event_type(sf_dir):
        """Per-user dominant event type (ops/profile.grouped_mode):
        per-block (user, type) partial counts, ONE hash shuffle on the
        user key, per-block argmax with the (count DESC, value ASC)
        deterministic tie-break."""
        from aml_entity_resolution_assignment_ray.ops.profile import (
            grouped_mode,
        )

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["user_id", "event_type"])
        return grouped_mode(ev, key="user_id", col="event_type")

    # ---- documents: text analysis + dedup ----

    def corpus_diff(sf_dir):
        """Corpus-version diff (ops/relational.dataset_diff): version B
        is derived deterministically from the documents table — drop
        doc_id % 23 == 0, upper-case text where doc_id % 17 == 0,
        append new docs for doc_id % 29 == 0 — and the diff labels
        every id added/removed/changed/same.  Digest-only full-outer
        join; the text never enters the shuffle."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            dataset_diff,
        )

        _tune_context()
        docs = _read(sf_dir, "documents").select_columns(
            ["doc_id", "text"])

        def version_b(df: pd.DataFrame) -> pd.DataFrame:
            out = df[df["doc_id"] % 23 != 0].copy()
            m = out["doc_id"] % 17 == 0
            out.loc[m, "text"] = out.loc[m, "text"].str.upper()
            new = df[df["doc_id"] % 29 == 0].copy()
            new["doc_id"] = new["doc_id"] + 1_000_000
            new["text"] = "new document " + new["doc_id"].astype(str)
            return pd.concat([out, new], ignore_index=True)

        return dataset_diff(
            docs, docs.map_batches(version_b, batch_format="pandas"),
            id_col="doc_id", col="text")

    def customer_cdc_merged(sf_dir):
        """CDC MERGE INTO (ops/relational.cdc_merge): the orders table
        acts as the change stream against the customer snapshot —
        key o_custkey, LSN o_orderkey, op = delete when
        o_orderkey % 10 == 0 else upsert (payload: totalprice-derived
        acctbal cents, segment 'UPDATED').  Highest-LSN change per key
        wins; surviving snapshot comes back with last_seq."""
        from aml_entity_resolution_assignment_ray.ops.relational import cdc_merge

        _tune_context()
        base_src = _read(sf_dir, "customer").select_columns(
            ["c_custkey", "c_acctbal", "c_mktsegment"])

        def to_base(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "c_custkey": df["c_custkey"].astype("int64"),
                "acctbal_cents": _round_half_away(
                    df["c_acctbal"].to_numpy() * 100).astype("int64"),
                "c_mktsegment": df["c_mktsegment"],
            })

        ch_src = _read(sf_dir, "orders").select_columns(
            ["o_orderkey", "o_custkey", "o_totalprice"])

        def to_changes(df: pd.DataFrame) -> pd.DataFrame:
            seq = df["o_orderkey"].astype("int64")
            return pd.DataFrame({
                "c_custkey": df["o_custkey"].astype("int64"),
                "seq": seq,
                "op": np.where(seq % 10 == 0, "delete", "upsert"),
                "acctbal_cents": _round_half_away(
                    df["o_totalprice"].to_numpy() * 100).astype("int64"),
                "c_mktsegment": np.full(len(df), "UPDATED"),
            })

        out = cdc_merge(
            base_src.map_batches(to_base, batch_format="pandas"),
            ch_src.map_batches(to_changes, batch_format="pandas"),
            key_col="c_custkey", seq_col="seq", op_col="op",
            val_cols=("acctbal_cents", "c_mktsegment"))

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "c_custkey": df["c_custkey"].astype("int64"),
                "acctbal_cents": df["acctbal_cents"].astype("int64"),
                "c_mktsegment": df["c_mktsegment"].astype(str),
                "last_seq": df["last_seq"].astype("int64"),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def exact_dedup_docs(sf_dir):
        _tune_context()
        return dedup.exact_dedup(_read(sf_dir, "documents"))

    def doc_dedup_keep_best(sf_dir):
        """Quality-aware duplicate representative selection
        (ops/dedup.dedup_keep_best): docs dedup'd on their lowercased
        ws-normalized text, each group keeping the LONGEST original
        (max n_chars, ties -> min doc_id) plus the group size — the
        keep-the-best-member policy real corpus prep applies instead
        of keep-first.  Same shape as exact_dedup: per-block
        argmax+count combiner, ONE digest-keyed shuffle."""
        _tune_context()
        docs = _read(sf_dir, "documents").select_columns(
            ["doc_id", "text", "n_chars"])

        def norm(df: pd.DataFrame) -> pd.DataFrame:
            from aml_entity_resolution_assignment_ray.ops.text import (
                _WS_DISAGREE_RE,
            )

            t = (df["text"].fillna("").astype(str)
                 .str.replace(_WS_DISAGREE_RE, " ", regex=True)
                 .str.lower().str.split().str.join(" "))
            return pd.DataFrame({"norm_text": t, "doc_id": df["doc_id"],
                                 "n_chars": df["n_chars"]})

        res = dedup.dedup_keep_best(
            docs.map_batches(norm, batch_format="pandas"),
            key_col="norm_text", score_col="n_chars", id_col="doc_id")
        return res.map_batches(
            lambda d: pd.DataFrame({
                "norm_text": d["norm_text"],
                "doc_id": d["doc_id"].astype("int64"),
                "n_chars": d["n_chars"].astype("int64"),
                "n_dups": d["n_dups"].astype("int64"),
            }), batch_format="pandas")

    def doc_token_counts(sf_dir):
        _tune_context()
        return text.token_stats(
            _read(sf_dir, "documents").select_columns(["doc_id", "text"])
        ).select_columns(["doc_id", "n_tokens", "n_bpe_tokens",
                          "n_bpe_merged_tokens"])

    def doc_repetition(sf_dir):
        """Gopher-style repetition filters: duplicate-line fraction and
        duplicate word-trigram fraction per document."""
        _tune_context()
        rep = text.repetition(
            _read(sf_dir, "documents", spread=True)
            .select_columns(["doc_id", "text"]))

        def rounded(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": df["doc_id"],
                "dup_line_frac": _round_half_away(df["dup_line_frac"], 6),
                "dup_trigram_frac": _round_half_away(
                    df["dup_trigram_frac"], 6),
            })

        return rep.map_batches(rounded, batch_format="pandas")

    def doc_line_dedup(sf_dir):
        """C4/Falcon-style boilerplate-line removal over the documents
        table reshaped into deterministic 4-word lines (the raw docs are
        single-line, so the reshape manufactures the cross-document
        shared-line structure the operator exists for): any line shared
        by >= 3 distinct docs is dropped, survivors rejoin in order."""
        _tune_context()
        import re as _re

        word_re = _re.compile(r"[a-z0-9]+")

        def to_lines(df: pd.DataFrame) -> pd.DataFrame:
            words = df["text"].fillna("").astype(str).str.lower() \
                .str.findall(word_re)
            text2 = words.map(lambda ws: "\n".join(
                " ".join(ws[i:i + 4]) for i in range(0, len(ws), 4)))
            return pd.DataFrame({"doc_id": df["doc_id"], "text": text2})

        lined = _read(sf_dir, "documents", spread=True) \
            .select_columns(["doc_id", "text"]) \
            .map_batches(to_lines, batch_format="pandas")
        return dedup.common_line_dedup(lined, min_docs=3)

    def doc_quality(sf_dir):
        _tune_context()
        return text.quality(
            _read(sf_dir, "documents").select_columns(["doc_id", "text"])
        ).select_columns(
            ["doc_id", "n_chars_text", "punct_ratio", "digit_ratio",
             "upper_ratio"])

    def doc_lang_id(sf_dir):
        _tune_context()
        return text.lang_id(
            _read(sf_dir, "documents").select_columns(["doc_id", "text"])
        ).select_columns(["doc_id", "lang_pred"])

    def doc_clean(sf_dir):
        """Canonical cleanup transform (ops/text.clean_text): NFC +
        control-char strip + whitespace collapse + 200-codepoint
        truncation, value-oracled byte for byte."""
        _tune_context()
        out = text.clean_text(
            _read(sf_dir, "documents").select_columns(["doc_id", "text"]),
            max_chars=200)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "clean_text": df["clean_text"].astype(str),
                "n_chars": df["n_chars"].astype("int64"),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def doc_fingerprints(sf_dir):
        _tune_context()
        return text.fingerprints(
            _read(sf_dir, "documents").select_columns(["doc_id", "text"])
        ).select_columns(["doc_id", "fingerprint"])

    def doc_pii_scrub(sf_dir):
        _tune_context()
        return text.pii_scrub(
            _read(sf_dir, "documents").select_columns(["doc_id", "text"]))

    def doc_top_terms(sf_dir):
        _tune_context()
        return text.top_terms(
            _read(sf_dir, "documents").select_columns(["text"]), k=50)

    def doc_tfidf_top5(sf_dir):
        """Per-document top-5 terms by tf-idf (score = tf * ln(N/df),
        ties by word): tokenize -> (doc, word, tf) -> doc-frequency
        pre-aggregate -> hash join on word -> group_topk combiner."""
        _tune_context()
        out = text.doc_tfidf(
            _read(sf_dir, "documents").select_columns(["doc_id", "text"]),
            k=5, cfg=EngineConfig())

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "word": df["word"],
                "score": _round_half_away(df["score"], 6),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def exact_dedup_incremental(sf_dir):
        """Continuous-ingestion exact dedup: the documents table
        arrives as two increments (doc_id below / at-or-above the
        midpoint); each ingest dedups against the PERSISTED survivor
        index and appends its new survivors
        (ops/dedup.incremental_exact_dedup — first-seen-wins across
        increments, min-id within one).  Because the increments are
        ordered by id, the accumulated index equals the one-shot
        GROUP BY, which is the oracle."""
        import shutil

        _tune_context()
        n = _table_rows(sf_dir, "documents")
        ipath = f"/tmp/er_dedup_idx_n{n}"
        shutil.rmtree(ipath, ignore_errors=True)
        docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
        mid = n // 2
        dedup.incremental_exact_dedup(
            docs.filter(expr=f"doc_id < {mid}"), ipath)
        dedup.incremental_exact_dedup(
            docs.filter(expr=f"doc_id >= {mid}"), ipath)
        out = dedup.read_dedup_index(ipath)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"text": df["text"],
                                 "doc_id": df["doc_id"].astype("int64")})

        return out.map_batches(finalize, batch_format="pandas")

    def doc_lm_score(sf_dir):
        """Perplexity-style fluency score: per-doc mean bigram
        log-probability under an add-one-smoothed bigram LM trained on
        the corpus itself (ops/text.bigram_lm_score — combiner-reduced
        count shuffles + two hash joins, no broadcast)."""
        _tune_context()
        out = text.bigram_lm_score(
            _read(sf_dir, "documents", spread=True)
            .select_columns(["doc_id", "text"]))

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "n_bigrams": df["n_bigrams"].astype("int64"),
                "avg_logp": _round_half_away(df["avg_logp"], 6),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def doc_collocations(sf_dir):
        """Collocation mining: top-50 word bigrams by PMI with a
        min-count-5 support floor (ops/text.top_collocations —
        combiner-reduced bigram counts, marginal hash joins, support
        filter before the global sort+limit)."""
        _tune_context()
        return text.top_collocations(
            _read(sf_dir, "documents", spread=True)
            .select_columns(["doc_id", "text"]), k=50, min_count=5)

    def doc_stratified_sample(sf_dir):
        """Deterministic stratified sample: the 25 docs per language
        with the smallest Knuth id-hash, with per-group rank
        (ops/sample.stratified_sample — combiner-bounded single keyed
        shuffle)."""
        from aml_entity_resolution_assignment_ray.ops.sample import stratified_sample

        _tune_context()
        out = stratified_sample(
            _read(sf_dir, "documents").select_columns(["doc_id", "lang"]),
            group_col="lang", id_col="doc_id", k=25, with_rank=True)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "lang": df["lang"],
                "sample_rank": df["rank"].astype("int64"),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def doc_pack(sf_dir):
        """Concat-and-chunk sequence packing: docs hash-assigned to 8
        shards, concatenated in (hash, id) order, cut into 2048-unit
        windows; each doc tagged with (shard, seq_id, seq_offset) of
        its first unit (ops/sample.pack_sequences — one keyed
        shuffle)."""
        from aml_entity_resolution_assignment_ray.ops.sample import pack_sequences

        _tune_context()
        out = pack_sequences(
            _read(sf_dir, "documents").select_columns(["doc_id", "n_chars"]),
            id_col="doc_id", len_col="n_chars", seq_len=2048, n_shards=8)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "shard": df["shard"].astype("int64"),
                "seq_id": df["seq_id"].astype("int64"),
                "seq_offset": df["seq_offset"].astype("int64"),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def doc_weighted_sample(sf_dir):
        """Quality-weighted deterministic downsampling: keep each doc
        with probability min(1, n_chars / 2000), decided by the id
        hash — integer-exact acceptance test, no RNG
        (ops/sample.weighted_sample)."""
        from aml_entity_resolution_assignment_ray.ops.sample import weighted_sample

        _tune_context()
        out = weighted_sample(
            _read(sf_dir, "documents").select_columns(["doc_id", "n_chars"]),
            id_col="doc_id", weight_col="n_chars", weight_scale=2000)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "n_chars": df["n_chars"].astype("int64"),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def doc_chunks(sf_dir):
        """Token-window chunking with overlap (ops/text.
        chunk_documents — size 32 stride 24, the RAG/embedding-context
        explode; stateless flat-map, no shuffle)."""
        _tune_context()
        return text.chunk_documents(
            _read(sf_dir, "documents").select_columns(["doc_id", "text"]),
            size=32, stride=24)

    def bpe_learned_merges(sf_dir):
        """Distributed BPE vocabulary induction (ops/text.
        train_bpe_merges): learn 8 merges from the corpus — one
        combiner-reduced pair-count shuffle per round, one stateless
        replace map for the new merge, driver holds only the count
        argmax.  The oracle replays all 8 rounds as a generated CTE
        chain."""
        _tune_context()
        res = text.train_bpe_merges(
            _read(sf_dir, "documents").select_columns(["text"]),
            n_merges=8)
        return res.rename(columns={"rank": "merge_rank"})

    def bpe_token_histogram(sf_dir):
        """Subword vocabulary usage histogram after applying the
        engine's merge table (ops/text.bpe_token_histogram): per-block
        Counter combiner bounds the shuffle by the DISTINCT subword
        vocabulary; the oracle replays the identical replace() chain
        over the identical spaced layout and unnests the split."""
        _tune_context()
        return text.bpe_token_histogram(
            _read(sf_dir, "documents").select_columns(["text"]))

    def doc_token_ids(sf_dir):
        """Corpus ENCODE to token ids (ops/text.bpe_encode): merge
        table applied, vocabulary = sorted distinct subwords persisted
        to parquet (model-as-input), long-form (doc_id, pos, token_id)
        sequences; the oracle replays the replace() chain and joins
        the persisted vocab.  A doc_id % 7 == 0 slice keeps the
        hashed result driver-gate-sized while exercising every path."""
        _tune_context()
        docs = _read(sf_dir, "documents").select_columns(
            ["doc_id", "text"]).map_batches(
            lambda d: d[d["doc_id"] % 7 == 0], batch_format="pandas")
        out = text.bpe_encode(
            docs, vocab_path=_bpe_vocab_path(_corpus_entities(sf_dir)))

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "pos": df["pos"].astype("int64"),
                "token_id": df["token_id"].astype("int64"),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def source_mixture(sf_dir):
        """Data-mixing weight table: per-source token shares and the
        sampling weights that reshape the corpus to a uniform token
        mixture (ops/sample.source_mixture_weights — one combiner-
        reduced groupby, text never shuffles)."""
        from aml_entity_resolution_assignment_ray.ops.sample import (
            source_mixture_weights,
        )

        _tune_context()
        return source_mixture_weights(
            _read(sf_dir, "documents").select_columns(["source", "text"]))

    def mixture_resampled(sf_dir):
        """End-to-end mixture reshaping: the source_mixture_weights
        table (uniform token target) feeds weighted_sample as an
        integer acceptance probability per source — docs survive with
        probability min(1, weight), decided by the deterministic id
        hash.  The composition that actually APPLIES a mixture, not
        just computes it; the weight table is source-cardinality-small
        and broadcast."""
        import ray as _ray

        from aml_entity_resolution_assignment_ray.ops.sample import (
            source_mixture_weights,
            weighted_sample,
        )

        _tune_context()
        docs = _read(sf_dir, "documents").select_columns(
            ["doc_id", "source", "text"])
        wdf = source_mixture_weights(docs).to_pandas()
        wmap = dict(zip(
            wdf["source"],
            _round_half_away(wdf["weight"].to_numpy(np.float64)
                             * 10 ** 6).astype(np.int64)))
        wref = _ray.put(wmap)

        def attach(d: pd.DataFrame) -> pd.DataFrame:
            m = _ray.get(wref)
            return pd.DataFrame({
                "doc_id": d["doc_id"].astype("int64"),
                "source": d["source"],
                "w_int": d["source"].map(m).astype("int64"),
            })

        kept = weighted_sample(
            docs.map_batches(attach, batch_format="pandas"),
            id_col="doc_id", weight_col="w_int", weight_scale=10 ** 6)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "source": df["source"].astype(str),
            })

        return kept.map_batches(finalize, batch_format="pandas")

    def doc_shuffle_index(sf_dir):
        """Deterministic global training shuffle: (shard, pos) address
        per doc — shard by id hash, pos = rank within shard in
        (hash, id) order (ops/sample.shuffle_index; no random_shuffle
        all-to-all, reproducible across cluster sizes)."""
        from aml_entity_resolution_assignment_ray.ops.sample import shuffle_index

        _tune_context()
        out = shuffle_index(
            _read(sf_dir, "documents").select_columns(["doc_id"]),
            id_col="doc_id", n_shards=8)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "shard": df["shard"].astype("int64"),
                "pos": df["pos"].astype("int64"),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def doc_pack_texts(sf_dir):
        """Materialized packed training sequences: each shard's docs
        concatenated in (hash, id) order, cut into fixed 512-char
        windows (ops/sample.pack_sequence_texts — two keyed shuffles,
        every piece moves once, no stream assembled in one place)."""
        from aml_entity_resolution_assignment_ray.ops.sample import pack_sequence_texts

        _tune_context()
        return pack_sequence_texts(
            _read(sf_dir, "documents").select_columns(["doc_id", "text"]),
            id_col="doc_id", text_col="text", seq_len=512, n_shards=8)

    def source_char_budget_sample(sf_dir):
        """Per-source character-budgeted selection (ops/sample.
        token_budget_sample): each source contributes docs in Knuth-
        hash order until 4,000 chars — the deterministic "at most N
        tokens per source" mixing primitive."""
        from aml_entity_resolution_assignment_ray.ops.sample import (
            token_budget_sample,
        )

        _tune_context()
        docs = _read(sf_dir, "documents").select_columns(
            ["source", "doc_id", "n_chars"])
        out = token_budget_sample(docs, group_col="source",
                                  id_col="doc_id", token_col="n_chars",
                                  budget=4_000)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "source": df["source"],
                "doc_id": df["doc_id"].astype(np.int64),
                "n_chars": df["n_chars"].astype(np.int64),
                "cum_n_chars": df["cum_n_chars"].astype(np.int64),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def doc_hash_split(sf_dir):
        """Deterministic 80/20 train/test split (Knuth multiplicative
        hash on doc_id — reproducible across runs, cluster sizes and
        repartitionings; ops/sample.hash_split)."""
        from aml_entity_resolution_assignment_ray.ops.sample import hash_split

        _tune_context()
        out = hash_split(
            _read(sf_dir, "documents").select_columns(["doc_id"]),
            id_col="doc_id", test_pct=20)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "split": df["split"],
            })

        return out.map_batches(finalize, batch_format="pandas")

    def doc_contamination(sf_dir):
        """Benchmark decontamination (ops/contamination.py): docs with
        doc_id % 20 == 0 act as the held-out benchmark; every other doc
        is flagged with how many of its distinct token 4-grams appear in
        the benchmark (4 rather than the published 13 so the synthetic
        corpus yields a dense nonzero signal to hash).  Broadcast path
        at this scale (the benchmark gram set is small); the distributed
        semi-join path is pinned equal in
        tests/test_ops.py::test_contamination_paths_agree."""
        _tune_context()
        from aml_entity_resolution_assignment_ray.ops.contamination import (
            ngram_contamination,
        )

        docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
        bench = docs.map_batches(lambda d: d[d["doc_id"] % 20 == 0],
                                 batch_format="pandas")
        corpus = docs.map_batches(lambda d: d[d["doc_id"] % 20 != 0],
                                  batch_format="pandas")
        out = ngram_contamination(corpus, bench, n=4)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "n_contaminated_grams":
                    df["n_contaminated_grams"].astype("int64"),
                "contaminated": df["contaminated"].astype(bool),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def doc_dup_grams(sf_dir):
        """ExactSubstr-style duplicate-span signal (ops/dedup.py::
        dup_gram_stats): per doc, the count and fraction of its distinct
        token 8-grams occurring in >= 2 documents."""
        _tune_context()
        from aml_entity_resolution_assignment_ray.ops.dedup import dup_gram_stats

        out = dup_gram_stats(
            _read(sf_dir, "documents").select_columns(["doc_id", "text"]),
            n=8)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "n_grams": df["n_grams"].astype("int64"),
                "n_dup_grams": df["n_dup_grams"].astype("int64"),
                "dup_fraction": _round_half_away(df["dup_fraction"], 6),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def doc_substring_dedup(sf_dir):
        """ExactSubstr span REMOVAL (ops/dedup.py::substring_dedup,
        Lee et al. 2022): token 8-grams occurring >= 2 times
        corpus-wide mark their positions; covered tokens drop and each
        doc is reassembled from the survivors."""
        _tune_context()
        from aml_entity_resolution_assignment_ray.ops.dedup import substring_dedup

        out = substring_dedup(
            _read(sf_dir, "documents").select_columns(["doc_id", "text"]),
            n=8)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "n_tokens": df["n_tokens"].astype("int64"),
                "n_removed": df["n_removed"].astype("int64"),
                "cleaned_text": df["cleaned_text"].astype(str),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def corpus_prep_q(sf_dir):
        """The composite LLM training-data prep pipeline
        (pipelines/corpus_prep.py): exact dedup -> quality + language
        filter -> 4-gram decontamination vs the doc_id%20 benchmark ->
        token counts, one streaming Dataset composition.  The DuckDB
        oracle replays the ENTIRE chain including the float64
        quality_score expression and the stopword-voting LID."""
        _tune_context()
        from aml_entity_resolution_assignment_ray.pipelines.corpus_prep import (
            corpus_prep,
        )

        docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
        bench = docs.map_batches(lambda d: d[d["doc_id"] % 20 == 0],
                                 batch_format="pandas")
        corpus = docs.map_batches(lambda d: d[d["doc_id"] % 20 != 0],
                                  batch_format="pandas")
        out = corpus_prep(corpus, bench, quality_min=0.35, lang="en",
                          contamination_n=4)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "n_chars_text": df["n_chars_text"].astype("int64"),
                "n_tokens": df["n_tokens"].astype("int64"),
                "quality_score": _round_half_away(df["quality_score"], 6),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def event_sessions(sf_dir):
        _tune_context()
        from aml_entity_resolution_assignment_ray.ops.events import sessionize

        return sessionize(_read(sf_dir, "events"), gap_s=1800)

    def event_type_drift(sf_dir):
        """Population Stability Index terms between two event
        snapshots (even vs odd event_id — the deterministic stand-in
        for yesterday-vs-today): ops/profile.population_stability.
        Exact counts via one keyed_sum per side; the ln-based term is
        rounded to 6 on both engine and oracle (the grouped_entropy
        contract)."""
        from aml_entity_resolution_assignment_ray.ops.profile import (
            population_stability,
        )

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["event_id", "event_type"]).materialize()
        a = ev.map_batches(lambda d: d[d["event_id"] % 2 == 0],
                           batch_format="pandas")
        b = ev.map_batches(lambda d: d[d["event_id"] % 2 == 1],
                           batch_format="pandas")
        return population_stability(a, b, col="event_type")

    def user_busy_intervals(sf_dir):
        """Gaps-and-islands interval coalescing (ops/events.
        merge_intervals): each event opens a 10-minute activity
        window [ts, ts+600s]; overlapping-or-abutting windows per user
        merge into busy periods.  ONE user-keyed shuffle + per-block
        grouped running-max island detection; exact int64 epoch-us
        bounds make the islands layout-invariant and the SQL window
        replay hash-exact."""
        from aml_entity_resolution_assignment_ray.ops.events import (
            merge_intervals,
        )

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["user_id", "ts"]).map_batches(
            lambda d: pd.DataFrame({
                "user_id": d["user_id"].astype(np.int64),
                "st": d["ts"].to_numpy(dtype="datetime64[us]")
                    .astype(np.int64),
                "en": d["ts"].to_numpy(dtype="datetime64[us]")
                    .astype(np.int64) + 600_000_000}),
            batch_format="pandas")
        return merge_intervals(ev, key="user_id", start_col="st",
                               end_col="en")

    def session_type_lift(sf_dir):
        """Market-basket association over sessions (ops/events.
        session_association): sessions as baskets of distinct event
        types -> per-pair exact support + lift from exact integer
        counts.  ONE user-keyed shuffle; pair/singleton/total partials
        fold through a single tagged keyed_sum bounded by the type
        vocabulary; lift's only float step is the final cast-divide
        the oracle replays from HUGEINT counts."""
        from aml_entity_resolution_assignment_ray.ops.events import (
            session_association,
        )

        _tune_context()
        return session_association(_read(sf_dir, "events"), gap_s=1800)

    def sliding_event_counts(sf_dir):
        """Sliding-window aggregate (1h window, 15min slide): replicate
        each event to its nrep windows with an in-batch combiner, one
        hash shuffle on window_start."""
        _tune_context()
        from aml_entity_resolution_assignment_ray.ops.events import (
            sliding_window_agg,
        )

        res = sliding_window_agg(_read(sf_dir, "events"),
                                 window_s=3600, slide_s=900)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "window_start": df["window_start"].dt.strftime(
                    "%Y-%m-%d %H:%M:%S"),
                "n_events": df["n_events"],
                "sum_value": _round_half_away(df["sum_value"], 2),
            })

        return res.map_batches(finalize, batch_format="pandas")

    def purchase_value_ecdf(sf_dir):
        """Cross-population ECDF transform (ops/profile.ecdf_lookup):
        every purchase event scored as P(click value <= its value) on
        the click distribution — broadcast cumulative reference,
        searchsorted scoring, the scored stream never shuffles."""
        from aml_entity_resolution_assignment_ray.ops.profile import ecdf_lookup

        _tune_context()

        def side(etype):
            return _read(sf_dir, "events").select_columns(
                ["event_id", "event_type", "value"]).map_batches(
                lambda d, _e=etype: pd.DataFrame({
                    "event_id": d.loc[d["event_type"] == _e, "event_id"]
                    .astype("int64"),
                    "cents": _round_half_away(
                        d.loc[d["event_type"] == _e, "value"]
                        .to_numpy(np.float64) * 100).astype(np.int64)}),
                batch_format="pandas")

        out = ecdf_lookup(side("purchase"), side("click"), col="cents")

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_id": df["event_id"].astype("int64"),
                "cents": df["cents"].astype("int64"),
                "ecdf": df["ecdf"].astype("float64"),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def event_type_gini(sf_dir):
        """Per-type Gini concentration of event value cents
        (ops/profile.grouped_gini): sorted-scan rank-weighted sums,
        exact-integer numerator/denominator, one keyed shuffle."""
        from aml_entity_resolution_assignment_ray.ops.profile import grouped_gini

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["event_type", "value"]).map_batches(
            lambda d: pd.DataFrame({
                "event_type": d["event_type"],
                "cents": _round_half_away(
                    d["value"].to_numpy(np.float64) * 100)
                .astype(np.int64)}),
            batch_format="pandas")
        out = grouped_gini(ev, key="event_type", col="cents")

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_type": df["event_type"],
                "n": df["n"].astype("int64"),
                "gini": df["gini"].astype("float64"),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def event_value_ks(sf_dir):
        """Exact two-sample KS drift statistic between the click and
        purchase value distributions (ops/profile.ks_statistic):
        distinct-value combiners, one keyed merge, single-block CDF
        scan; sup-norm and its smallest attaining value."""
        from aml_entity_resolution_assignment_ray.ops.profile import ks_statistic

        _tune_context()

        def side(etype):
            return _read(sf_dir, "events").select_columns(
                ["event_type", "value"]).map_batches(
                lambda d, _e=etype: pd.DataFrame({
                    "cents": _round_half_away(
                        d.loc[d["event_type"] == _e, "value"]
                        .to_numpy(np.float64) * 100).astype(np.int64)}),
                batch_format="pandas")

        out = ks_statistic(side("click"), side("purchase"), col="cents")

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "ks": df["ks"].astype("float64"),
                "at_value": df["at_value"].astype("int64"),
                "n_a": df["n_a"].astype("int64"),
                "n_b": df["n_b"].astype("int64"),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def event_type_share(sf_dir):
        """Percent-of-total contribution analysis: each event type's
        exact share of global value cents — keyed_sum partials for the
        per-type sums, the SAME partials folded once more for the
        global (two ints on the driver), share = the identical IEEE
        quotient both sides, rounded half-away at 6."""
        from aml_entity_resolution_assignment_ray.ops.relational import keyed_sum

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["event_type", "value"]).map_batches(
            lambda d: pd.DataFrame({
                "event_type": d["event_type"],
                "cents": _round_half_away(
                    d["value"].to_numpy(np.float64) * 100)
                .astype(np.int64)}),
            batch_format="pandas")
        sums = keyed_sum(ev, ["event_type"], ["cents"]).materialize()
        total = int(sums.map_batches(
            lambda d: pd.DataFrame({"s": [d["cents"].sum()]}),
            batch_format="pandas").to_pandas()["s"].sum())

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            c = df["cents"].to_numpy(np.int64)
            return pd.DataFrame({
                "event_type": df["event_type"],
                "total_cents": c,
                "share": _round_half_away(
                    c.astype(np.float64) / float(total), 6),
            })

        return sums.map_batches(finalize, batch_format="pandas")

    def sliding_user_counts(sf_dir):
        """EXACT distinct users per sliding window (1h / 15min slide)
        — ops/events.sliding_distinct_users, the exact sibling of the
        hourly_approx_users KMV sketch: distinct (window, user)
        combiner, one hash shuffle."""
        _tune_context()
        from aml_entity_resolution_assignment_ray.ops.events import (
            sliding_distinct_users,
        )

        res = sliding_distinct_users(_read(sf_dir, "events"),
                                     window_s=3600, slide_s=900)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "window_start": df["window_start"].dt.strftime(
                    "%Y-%m-%d %H:%M:%S"),
                "n_users": df["n_users"].astype("int64"),
            })

        return res.map_batches(finalize, batch_format="pandas")

    def orders_asof(sf_dir):
        """As-of join: each event picks up its user's most recent prior
        order (ties on o_orderdate break by greatest o_orderkey) — one
        keyed shuffle of the unioned sides + vectorized forward fill."""
        _tune_context()
        from aml_entity_resolution_assignment_ray.ops.relational import (
            asof_join,
        )

        events = _read(sf_dir, "events").select_columns(
            ["event_id", "user_id", "ts"])
        orders = _read(sf_dir, "orders").select_columns(
            ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]) \
            .rename_columns({"o_custkey": "user_id"})
        res = asof_join(events, orders, key="user_id", left_ts="ts",
                        right_ts="o_orderdate",
                        right_cols=["o_orderkey", "o_totalprice"],
                        right_id="o_orderkey")
        return res.map_batches(
            lambda df: df.rename(columns={
                "o_orderkey": "last_order_key",
                "o_totalprice": "last_order_price"})[
                ["event_id", "user_id", "last_order_key",
                 "last_order_price"]],
            batch_format="pandas")

    def lineitem_ship_window(sf_dir):
        """Keyed range (interval) join: line items shipped within 60
        days AFTER their order's date — equality on the order key plus
        a vectorized interval filter, one keyed shuffle."""
        _tune_context()
        from aml_entity_resolution_assignment_ray.ops.relational import (
            range_join,
        )

        li = _read(sf_dir, "lineitem").select_columns(
            ["l_orderkey", "l_linenumber", "l_shipdate"])
        orders = _read(sf_dir, "orders").select_columns(
            ["o_orderkey", "o_orderdate", "o_totalprice"]) \
            .rename_columns({"o_orderkey": "l_orderkey"})
        res = range_join(li, orders, left_ts="l_shipdate",
                         right_ts="o_orderdate", lo_s=0.0,
                         hi_s=60 * 86400.0, key="l_orderkey",
                         right_cols=["o_totalprice"])
        return res.select_columns(
            ["l_orderkey", "l_linenumber", "o_totalprice"])

    def cust_top_orders(sf_dir):
        """Group-wise top-k (the row_number() window pattern): each
        customer's 3 highest-value orders with rank."""
        _tune_context()
        from aml_entity_resolution_assignment_ray.ops.relational import (
            group_topk,
        )

        orders = _read(sf_dir, "orders").select_columns(
            ["o_custkey", "o_orderkey", "o_totalprice"])
        return group_topk(orders, key="o_custkey", order_col="o_totalprice",
                          k=3, tie_col="o_orderkey", with_rank=True)

    def price_quantiles(sf_dir):
        """Exact grouped discrete quantiles via the (key, value)-count
        combiner; DuckDB quantile_disc semantics."""
        _tune_context()
        from aml_entity_resolution_assignment_ray.ops.relational import (
            grouped_quantiles,
        )

        li = _read(sf_dir, "lineitem").select_columns(
            ["l_returnflag", "l_extendedprice"])
        return grouped_quantiles(li, key="l_returnflag",
                                 col="l_extendedprice",
                                 qs=[0.5, 0.9, 0.99])

    def gram_overlap_est(sf_dir):
        """Benchmark-vs-corpus contamination rate estimated by KMV
        sketch algebra (ops/sketch.kmv_overlap): distinct-4-gram
        union/intersection/jaccard from two bounded sketches — each
        side ONE combiner-reduced pass, no gram join, nothing
        input-sized anywhere.  The exact counterpart is
        doc_contamination's digest semi-join."""
        from aml_entity_resolution_assignment_ray.ops.sketch import kmv_overlap

        _tune_context()
        docs = _read(sf_dir, "documents").select_columns(
            ["doc_id", "text"])

        def grams(side):
            return text.chunk_documents(side, size=4, stride=1) \
                .filter(expr="n_tokens == 4") \
                .select_columns(["chunk_text"])

        bench = docs.map_batches(lambda d: d[d["doc_id"] % 20 == 0],
                                 batch_format="pandas")
        corpus = docs.map_batches(lambda d: d[d["doc_id"] % 20 != 0],
                                  batch_format="pandas")
        return kmv_overlap(grams(bench), grams(corpus),
                           col="chunk_text", k=256)

    def hourly_approx_users(sf_dir):
        """Windowed sketch composition: KMV approximate distinct users
        per HOUR (ops/sketch.kmv_distinct over a derived window key —
        the streaming-dashboard shape: <= k rows per block-hour move,
        never the user set)."""
        from aml_entity_resolution_assignment_ray.ops.sketch import kmv_distinct

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(["ts", "user_id"])

        def add_hour(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "hour": df["ts"].dt.floor("h")
                .dt.strftime("%Y-%m-%d %H:%M:%S"),
                "user_id": df["user_id"],
            })

        return kmv_distinct(
            ev.map_batches(add_hour, batch_format="pandas"),
            key="hour", col="user_id", k=64, out_col="approx_users")

    def event_value_pct_rank(sf_dir):
        """Per-group CDF position (ops/relational.grouped_percent_rank
        — one keyed shuffle, vectorized grouped rank; the
        normalized-score transform)."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            grouped_percent_rank,
        )

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["event_id", "event_type", "value"])
        return grouped_percent_rank(ev, key="event_type", col="value")

    def event_global_rank(sf_dir):
        """GLOBAL ORDER BY rank without a global sort
        (ops/relational.global_rank): distinct-value exclusive offsets
        from one cumsum + one value-keyed shuffle with a within-value
        tiebreak rank — row_number() OVER (ORDER BY cents, event_id)
        exactly."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            global_rank,
        )

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["event_id", "value"]).map_batches(
            lambda d: pd.DataFrame({
                "event_id": d["event_id"].astype("int64"),
                "cents": _round_half_away(
                    d["value"].to_numpy(np.float64) * 100)
                .astype(np.int64)}),
            batch_format="pandas")
        out = global_rank(ev, val_col="cents", tie_col="event_id")

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_id": df["event_id"].astype("int64"),
                "cents": df["cents"].astype("int64"),
                "global_rank": df["global_rank"].astype("int64"),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def event_value_dense_rank(sf_dir):
        """Gapless per-group value rank (ops/relational.
        grouped_dense_rank — one keyed shuffle, per-block grouped
        dense rank; exact integers)."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            grouped_dense_rank,
        )

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["event_id", "event_type", "value"])
        out = grouped_dense_rank(ev, key="event_type", col="value")

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_id": df["event_id"].astype("int64"),
                "event_type": df["event_type"],
                "value": df["value"].astype("float64"),
                "dense_rank": df["dense_rank"].astype("int64"),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def event_feature_hash(sf_dir):
        """Hashing-trick featurization (ops/sample.feature_hash):
        event_type and user_id become '<col>:<value>' tokens hashed by
        the polynomial string hash mod 64; collisions fold by count —
        sparse long-form (event_id, feature_idx, n)."""
        from aml_entity_resolution_assignment_ray.ops.sample import feature_hash

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["event_id", "event_type", "user_id"]).map_batches(
            lambda d: pd.DataFrame({
                "event_id": d["event_id"].astype("int64"),
                "event_type": d["event_type"].astype(str),
                "user_id": d["user_id"].astype("int64"),
            }), batch_format="pandas")
        out = feature_hash(ev, id_col="event_id",
                           cat_cols=["event_type", "user_id"],
                           n_features=64)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_id": df["event_id"].astype("int64"),
                "feature_idx": df["feature_idx"].astype("int64"),
                "n": df["n"].astype("int64"),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def event_value_imputed(sf_dir):
        """Group-mean null imputation (ops/relational.impute_by_group):
        error events' values become NULL (the deterministic missing
        mask), then fill with the user's rounded non-null mean cents,
        global mean for all-null users; exact-integer replay."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            impute_by_group,
        )

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["event_id", "user_id", "event_type", "value"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            cents = _round_half_away(
                df["value"].to_numpy(dtype=np.float64) * 100)
            return pd.DataFrame({
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "cents": np.where(df["event_type"] == "error",
                                  np.nan, cents),
            })

        out = impute_by_group(
            ev.map_batches(prep, batch_format="pandas"),
            key="user_id", col="cents")

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_id": df["event_id"].astype("int64"),
                "value_cents": df["cents"].astype("int64"),
                "was_imputed": df["was_imputed"].astype(bool),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def purchase_click_window(sf_dir):
        """Stream-stream windowed join: every (purchase, click) pair
        by the SAME user within +-6h of each other — ops/relational.
        range_join with a symmetric window (lo=-delta, hi=+delta) and
        the user equality key: ONE hash shuffle co-locates each
        user's rows from both streams, pairs form key-locally."""
        from aml_entity_resolution_assignment_ray.ops.relational import range_join

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["event_id", "user_id", "event_type", "ts"])

        def side(etype, eid_name):
            def f(df: pd.DataFrame) -> pd.DataFrame:
                d = df[df["event_type"] == etype]
                return pd.DataFrame({
                    "user_id": d["user_id"].astype("int64"),
                    eid_name: d["event_id"].astype("int64"),
                    f"{eid_name[0]}_tus": (
                        d["ts"].astype("datetime64[ns]").astype("int64")
                        // 1000).astype(np.int64),
                    "ts": d["ts"],
                })
            return f

        purchases = ev.map_batches(side("purchase", "p_eid"),
                                   batch_format="pandas")
        clicks = ev.map_batches(side("click", "c_eid"),
                                batch_format="pandas")
        j = range_join(purchases, clicks, left_ts="ts", right_ts="ts",
                       lo_s=-21600, hi_s=21600, key="user_id",
                       right_cols=["c_eid", "c_tus"])

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            gap = np.abs(df["p_tus"].to_numpy(np.int64)
                         - df["c_tus"].to_numpy(np.int64))
            return pd.DataFrame({
                "p_eid": df["p_eid"].astype("int64"),
                "c_eid": df["c_eid"].astype("int64"),
                "gap_us": gap,
            })

        return j.map_batches(finalize, batch_format="pandas")

    def user_first_last_event(sf_dir):
        """first_value/last_value per user over (ts, event_id) total
        order (ops/relational.grouped_first_last: per-block extreme-row
        combiner — at most 2 rows per block-key move — then one keyed
        shuffle).  First-touch / last-touch attribution shape."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            grouped_first_last,
        )

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["event_id", "user_id", "ts", "value"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "user_id": df["user_id"].astype("int64"),
                "event_id": df["event_id"].astype("int64"),
                "tus": (df["ts"].astype("datetime64[ns]").astype("int64")
                        // 1000).astype(np.int64),
                "value": df["value"].astype("float64"),
            })

        out = grouped_first_last(
            ev.map_batches(prep, batch_format="pandas"),
            key="user_id", order_cols=["tus", "event_id"],
            cols=["tus", "value"])

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "user_id": df["user_id"].astype("int64"),
                "first_tus": df["first_tus"].astype("int64"),
                "first_value": df["first_value"].astype("float64"),
                "last_tus": df["last_tus"].astype("int64"),
                "last_value": df["last_value"].astype("float64"),
            })

        return out.map_batches(finalize, batch_format="pandas")

    def event_gaps(sf_dir):
        """LAG window (ops/relational.grouped_lag): every event joined
        to its user's PREVIOUS event — seconds since the last event
        and the previous value, NULL on each user's first event.  One
        hash shuffle on user_id, then a per-block sort + vectorized
        grouped shift; the inter-event-delta featurization shape."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            grouped_lag,
        )

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["event_id", "user_id", "ts", "value"])
        res = grouped_lag(ev, key="user_id", order_cols=["ts", "event_id"],
                          cols=["ts", "value"])

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            ts = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
            prev = df["prev_ts"]
            prev_i = prev.to_numpy(dtype="datetime64[us]").astype(np.int64)
            gap = (ts - prev_i).astype(np.float64) / 1000000.0
            gap = np.where(prev.isna().to_numpy(), np.nan, gap)
            return pd.DataFrame({
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "gap_s": gap,
                "prev_value": df["prev_value"].astype("float64"),
            })

        return res.map_batches(finalize, batch_format="pandas")

    def user_event_transitions(sf_dir):
        """First-order Markov transition counts over each user's
        event-type sequence (ops/relational.grouped_lag composed with
        keyed_sum): how often event type A is followed by B — the
        behavioral-sequence statistic that feeds session modeling and
        next-event sampling.  One hash shuffle on user_id for the
        ordered shift, then a combiner-reduced count per (prev, cur);
        each user's first event has no predecessor and is excluded,
        exactly as the SQL LAG window's NULL rows."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            grouped_lag, keyed_sum,
        )

        _tune_context()
        cfg = EngineConfig()
        ev = _read(sf_dir, "events").select_columns(
            ["event_id", "user_id", "ts", "event_type"])
        lagged = grouped_lag(ev, key="user_id",
                             order_cols=["ts", "event_id"],
                             cols=["event_type"], cfg=cfg)

        def pairs(df: pd.DataFrame) -> pd.DataFrame:
            d = df[df["prev_event_type"].notna()]
            return pd.DataFrame({
                "prev_type": d["prev_event_type"].astype(str),
                "cur_type": d["event_type"].astype(str),
                "n": np.ones(len(d), dtype=np.int64)})

        return keyed_sum(lagged.map_batches(pairs, batch_format="pandas"),
                         ["prev_type", "cur_type"], ["n"], cfg)

    def event_type_approx_users(sf_dir):
        """KMV distinct-count sketch: approximate distinct users per
        event type (ops/sketch.kmv_distinct — k smallest distinct
        Knuth hashes, <= k rows per block-key shuffle; deterministic
        AND exactly SQL-replayable, so the oracle checks values, not
        tolerances)."""
        from aml_entity_resolution_assignment_ray.ops.sketch import kmv_distinct

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["event_type", "user_id"])
        return kmv_distinct(ev, key="event_type", col="user_id", k=64,
                            out_col="approx_users")

    def event_type_hll_users(sf_dir):
        """HyperLogLog distinct-count sketch: approximate distinct
        users per event type (ops/sketch.hll_distinct — 64 fixed-size
        registers merged by elementwise max, integer harmonic sum;
        deterministic AND exactly SQL-replayable, so the oracle
        checks values, not tolerances).  KMV's fixed-size sibling:
        the register table is 2^p rows per key however many distinct
        users exist."""
        from aml_entity_resolution_assignment_ray.ops.sketch import (
            hll_distinct,
        )

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["event_type", "user_id"])
        return hll_distinct(ev, key="event_type", col="user_id", p=6,
                            out_col="approx_users")

    def doc_contamination_bloom(sf_dir):
        """Bloom-gated decontamination (ops/sketch.bloom_build +
        bloom_maybe_contains): the benchmark side's distinct 4-grams
        set a FIXED-SIZE bitmap (m/8 bytes however large the benchmark
        grows) that is shipped once; every corpus gram then probes it
        with zero shuffles — bit-miss is an exact negative, bit-hit a
        deterministic maybe that would pre-gate the exact digest
        semi-join (doc_contamination).  Per-doc output counts distinct
        grams and Bloom hits; deterministic and exactly SQL-replayable
        (poly hash + affine bit positions in BIGINT), so the oracle
        checks values — false positives and all."""
        from aml_entity_resolution_assignment_ray.ops.sketch import (
            bloom_build,
            bloom_maybe_contains,
        )

        _tune_context()
        docs = _read(sf_dir, "documents").select_columns(
            ["doc_id", "text"])

        def grams(side):
            return text.chunk_documents(side, size=4, stride=1) \
                .filter(expr="n_tokens == 4") \
                .select_columns(["doc_id", "chunk_text"])

        bench = docs.map_batches(lambda d: d[d["doc_id"] % 20 == 0],
                                 batch_format="pandas")
        corpus = docs.map_batches(lambda d: d[d["doc_id"] % 20 != 0],
                                  batch_format="pandas")
        bitmap = bloom_build(grams(bench), col="chunk_text",
                             m_bits=1 << 16, k=3)
        probed = bloom_maybe_contains(grams(corpus), bitmap,
                                      col="chunk_text", k=3)

        def per_doc(df: pd.DataFrame) -> pd.DataFrame:
            # a doc's chunks never leave its block (stateless explode),
            # so per-block distinct + groupby is per-doc complete
            d = df.drop_duplicates(["doc_id", "chunk_text"])
            g = d.groupby("doc_id", sort=False)["bloom_maybe"] \
                .agg(["size", "sum"])
            return pd.DataFrame({
                "doc_id": g.index.to_numpy(),
                "n_grams": g["size"].to_numpy(dtype=np.int64),
                "n_bloom_hits": g["sum"].to_numpy(dtype=np.int64),
                "maybe_contaminated": g["sum"].to_numpy() > 0,
            })

        return probed.map_batches(per_doc, batch_format="pandas")

    def event_value_ntile(sf_dir):
        """ntile bucketing (ops/relational.grouped_ntile): every event
        assigned its event_type's 1-based septile by value — the
        curriculum/difficulty-band assignment, closed-form bucket
        arithmetic after ONE keyed shuffle."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            grouped_ntile,
        )

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["event_id", "event_type", "value"])
        return grouped_ntile(ev, key="event_type",
                             order_cols=["value", "event_id"], n=7)

    def event_type_cm_counts(sf_dir):
        """Count-Min frequency sketch (ops/sketch.cm_frequencies):
        approximate event count per event_type from a d x w counter
        table — the table is O(d*w) TOTAL however many distinct keys
        exist (the exact keyed_sum moves one partial row per
        block-key), cell-wise mergeable, and never underestimates.
        Deterministic and exactly SQL-replayable (BIGINT modular
        hashing + GROUP BY cell + min over rows), so the oracle checks
        values, not tolerances."""
        from aml_entity_resolution_assignment_ray.ops.sketch import (
            cm_frequencies,
        )

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(["event_type"])
        return cm_frequencies(ev, col="event_type", d=4, w=1024,
                              out_col="approx_count")

    def event_value_quantiles_sketch(sf_dir):
        """Bottom-m quantile SKETCH over a continuous unbounded column
        (ops/sketch.kmv_quantiles): per-group discrete quantiles from
        a deterministic bottom-m hash row sample — <= m rows per
        block-key move, closing the unbounded-domain gap
        grouped_quantiles documents.  Deterministic and exactly
        SQL-replayable (row_number() over the replayed Knuth hash +
        quantile_disc on the sample), so the oracle checks values."""
        from aml_entity_resolution_assignment_ray.ops.sketch import (
            kmv_quantiles,
        )

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["event_id", "event_type", "value"])
        return kmv_quantiles(ev, key="event_type", col="value",
                             id_col="event_id", qs=[0.25, 0.5, 0.9, 0.99],
                             m=256)

    def price_quantiles_cont(sf_dir):
        """Exact INTERPOLATED grouped quantiles (percentile_cont
        semantics) via the same (key, value)-count combiner as
        price_quantiles — ops/relational.grouped_quantiles_cont; the
        float interpolation expression is replayed verbatim by the
        oracle from row_number()-ranked values, so the hash compares
        bit-identical doubles."""
        _tune_context()
        from aml_entity_resolution_assignment_ray.ops.relational import (
            grouped_quantiles_cont,
        )

        li = _read(sf_dir, "lineitem").select_columns(
            ["l_returnflag", "l_extendedprice"])
        return grouped_quantiles_cont(li, key="l_returnflag",
                                      col="l_extendedprice",
                                      qs=[0.5, 0.9, 0.99])

    def cust_pareto(sf_dir):
        """Pareto frontier (ops/relational.pareto_front): customers
        undominated on (acctbal_cents, n_orders) — the multi-objective
        selection primitive.  Block-local skylines are a lossless
        combiner (any dominator of a pruned row survives into the
        fold), so only the expected-O(log^2 n) candidates cross the
        wire; exact int64 dims make the frontier layout-invariant and
        the NOT EXISTS oracle hash-exact."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            keyed_sum, pareto_front,
        )
        from aml_entity_resolution_assignment_ray.util import (
            round_half_away, safe_join,
        )

        _tune_context()
        cfg = EngineConfig()
        nparts = cfg.resolve_join_partitions()
        cust = _read(sf_dir, "customer").select_columns(
            ["c_custkey", "c_acctbal"]).map_batches(
            lambda d: pd.DataFrame({
                "c_custkey": d["c_custkey"].astype(np.int64),
                "acctbal_cents": round_half_away(
                    d["c_acctbal"].to_numpy() * 100).astype(np.int64)}),
            batch_format="pandas")
        ords = _read(sf_dir, "orders").select_columns(
            ["o_custkey"]).map_batches(
            lambda d: pd.DataFrame({
                "c_custkey": d["o_custkey"].astype(np.int64),
                "n_orders": np.ones(len(d), dtype=np.int64)}),
            batch_format="pandas")
        counts = keyed_sum(ords, ["c_custkey"], ["n_orders"], cfg)
        j = safe_join(cust, counts, join_type="left_outer",
                      num_partitions=nparts, on=("c_custkey",))
        full = j.map_batches(
            lambda d: pd.DataFrame({
                "c_custkey": d["c_custkey"].astype(np.int64),
                "acctbal_cents": d["acctbal_cents"].astype(np.int64),
                "n_orders": d["n_orders"].fillna(0).astype(np.int64)}),
            batch_format="pandas")
        return pareto_front(full, id_cols=["c_custkey"],
                            dims=["acctbal_cents", "n_orders"], cfg=cfg)

    def hourly_value_ohlc(sf_dir):
        """Per-(event_type, hour) open/high/low/close of the event
        value in cents (ops/relational.grouped_ohlc): each block emits
        at most 4 candidate rows per key (a lossless combiner), open /
        close tie-broken by the unique (ts, event_id) order so the
        result is deterministic and the SQL window replay hash-exact."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            grouped_ohlc,
        )
        from aml_entity_resolution_assignment_ray.util import (
            round_half_away,
        )

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["event_id", "event_type", "ts", "value"]).map_batches(
            lambda d: pd.DataFrame({
                "event_type": d["event_type"].astype(str),
                "hour": d["ts"].dt.floor("h").dt.strftime(
                    "%Y-%m-%d %H:%M:%S"),
                "ts": d["ts"],
                "event_id": d["event_id"].astype(np.int64),
                "value_cents": round_half_away(
                    d["value"].to_numpy() * 100).astype(np.int64)}),
            batch_format="pandas")
        return grouped_ohlc(ev, keys=["event_type", "hour"],
                            order_cols=["ts", "event_id"],
                            val_col="value_cents")

    def event_hour_value_corr(sf_dir):
        """Per-type Pearson correlation of hour-of-day vs value in
        cents (ops/profile.grouped_corr): exact integer sufficient
        statistics folded by ONE combiner-bounded shuffle, float64
        entering only in the final closed form — the identical
        expression the oracle evaluates from HUGEINT sums, so the
        driver hash compares bit-identical doubles."""
        from aml_entity_resolution_assignment_ray.ops.profile import (
            grouped_corr,
        )
        from aml_entity_resolution_assignment_ray.util import (
            round_half_away,
        )

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["event_type", "ts", "value"]).map_batches(
            lambda d: pd.DataFrame({
                "event_type": d["event_type"].astype(str),
                "x": d["ts"].dt.hour.astype(np.int64),
                "y": round_half_away(
                    d["value"].to_numpy() * 100).astype(np.int64)}),
            batch_format="pandas")
        return grouped_corr(ev, key="event_type", x_col="x", y_col="y")

    def events_above_median(sf_dir):
        """Per-group quantile gate: events at or above their OWN
        event_type's exact median value (ops/relational.
        filter_by_group_quantile — quantile_disc threshold join, the
        per-language quality-gating shape).  Bit-exact: the threshold
        is an actual group element, no rounding contract."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            filter_by_group_quantile,
        )

        _tune_context()
        ev = _read(sf_dir, "events").select_columns(
            ["event_id", "event_type", "value"])
        return filter_by_group_quantile(
            ev, key="event_type", col="value", q=0.5, keep="ge")

    def minhash_dup_pairs_docs(sf_dir):
        _tune_context()
        return dedup.minhash_lsh_dup_pairs(
            _read(sf_dir, "documents", spread=True), threshold=0.5
        ).select_columns(["id_a", "id_b"])

    def simhash_dup_pairs_docs(sf_dir):
        _tune_context()
        return dedup.simhash_dup_pairs(
            _read(sf_dir, "documents", spread=True), max_hamming=6
        ).select_columns(["id_a", "id_b"])

    def minhash_dedup_docs(sf_dir):
        _tune_context()
        return dedup.minhash_dedup(_read(sf_dir, "documents", spread=True), threshold=0.8)

    def minhash_dedup_incremental(sf_dir):
        """Continuous-ingestion NEAR-dedup: the documents table arrives
        as two id-ordered increments; each ingest near-dedups against
        the PERSISTED MinHash signature index and appends its survivors
        (ops/dedup.incremental_minhash_dedup — within an increment the
        min-id member of each verified-pair component survives, across
        increments first-seen wins).  Output: the accumulated surviving
        doc ids."""
        import shutil

        _tune_context()
        n = _table_rows(sf_dir, "documents")
        ipath = f"/tmp/er_mh_dedup_idx_n{n}"
        shutil.rmtree(ipath, ignore_errors=True)
        docs = _read(sf_dir, "documents", spread=True) \
            .select_columns(["doc_id", "text"])
        mid = n // 2
        dedup.incremental_minhash_dedup(
            docs.filter(expr=f"doc_id < {mid}"), ipath, threshold=0.8)
        dedup.incremental_minhash_dedup(
            docs.filter(expr=f"doc_id >= {mid}"), ipath, threshold=0.8)
        out = dedup.read_minhash_index(ipath)
        return out.map_batches(
            lambda df: pd.DataFrame(
                {"doc_id": df["doc"].astype(np.int64)}),
            batch_format="pandas")

    def ngram_jaccard_docs(sf_dir):
        _tune_context()
        return dedup.ngram_jaccard_pairs(
            _read(sf_dir, "documents", spread=True), threshold=0.5
        ).select_columns(["id_a", "id_b"])

    def doc_cosine_pairs(sf_dir):
        """Exact all-pairs TF-vector cosine >= 0.9 via inverted
        posting lists (ops/dedup.sparse_cosine_pairs, Bayardo-style):
        term-keyed shuffle, chunked per-term pair emission, keyed_sum
        dot folds — exact int64 until the final divide, so the pair
        set is layout-invariant and SQL-replayable."""
        _tune_context()
        res = dedup.sparse_cosine_pairs(
            _read(sf_dir, "documents", spread=True), threshold=0.9)
        return res.map_batches(
            lambda d: pd.DataFrame({
                "id_a": d["id_a"].astype(np.int64),
                "id_b": d["id_b"].astype(np.int64),
                "cosine": d["cosine"].astype(np.float64)}),
            batch_format="pandas")

    def doc_greedy_cover(sf_dir):
        """Greedy maximum-coverage selection: the 5 documents that
        together cover the most distinct word BIGRAMS, picked round by
        round (ops/sample.greedy_cover_select — anti_join vs the
        distributed covered set, keyed_sum gains, global_topk(1);
        driver holds one winner row per round).  The (1-1/e) greedy of
        coreset-style training-data selection, replayed by a per-round
        SQL chain."""
        from aml_entity_resolution_assignment_ray.ops.sample import (
            greedy_cover_select,
        )
        from aml_entity_resolution_assignment_ray.ops.text import _TERM_RE

        _tune_context()
        docs = _read(sf_dir, "documents", spread=True)

        def tok(df: pd.DataFrame) -> pd.DataFrame:
            t = df["text"].fillna("").astype(str).str.lower() \
                .str.findall(_TERM_RE)
            ids, grams = [], []
            for i, toks_ in zip(df["doc_id"].to_numpy(np.int64), t):
                if len(toks_) < 2:
                    continue
                a = np.asarray(toks_, dtype=object)
                bg = np.char.add(np.char.add(a[:-1].astype(str), " "),
                                 a[1:].astype(str))
                ids.append(np.full(len(bg), i, dtype=np.int64))
                grams.append(bg)
            if not ids:
                return pd.DataFrame({
                    "doc_id": df["doc_id"].iloc[:0].astype(np.int64),
                    "word": pd.Series([], dtype="string")})
            return pd.DataFrame({
                "doc_id": np.concatenate(ids),
                "word": np.concatenate(grams).astype(str)})

        return greedy_cover_select(
            docs.map_batches(tok, batch_format="pandas"),
            id_col="doc_id", item_col="word", k=5)

    # ---- embeddings: similarity search ----

    def ann_top10(sf_dir):
        _tune_context()
        emb = _read(sf_dir, "embeddings")
        q = emb.filter(expr="vec_id == 0").take(1)[0]["embedding"]
        res = ann.brute_force_topk(emb, np.asarray(q), k=10)
        return res[["vec_id"]]

    def ann_ivf_top10(sf_dir):
        """IVF approximate nearest neighbors (the scale path: seeded
        kmeans centroids on a random sample, storage written as
        CELL-PARTITIONED parquet, nprobe-cell probe that reads ONLY the
        probed cell directories).  Value-oracled: the DuckDB SQL replays
        the probe — nearest-nprobe cells from centroids.parquet, exact
        cosine top-k over just those cells' files; recall vs brute force
        is additionally pinned by tests/test_ops.py::test_ivf_recall."""
        import shutil

        _tune_context()
        emb = _read(sf_dir, "embeddings")
        q = emb.filter(expr="vec_id == 0").take(1)[0]["embedding"]
        ipath = _ivf_index_path(_corpus_entities(sf_dir))
        shutil.rmtree(ipath, ignore_errors=True)  # fresh build, no stale files
        idx = ann.build_ivf(emb, ncells=8, index_path=ipath)
        return idx.search(np.asarray(q), k=10, nprobe=4)[["vec_id"]]

    def ann_rrf_top10(sf_dir):
        """Hybrid-retrieval reciprocal-rank fusion (ops/ann.rrf_fuse):
        two integer-exact rankings over the int8-quantized embeddings
        — dot-product (desc) and squared-L2 (asc), each truncated to
        a top-20 list per query (queries: vec_id % 131 == 0) — fused
        with exact-integer RRF 10**9 // (60 + rank); top-10 fused
        rows per query with the fused rank."""
        import ray as _ray

        from aml_entity_resolution_assignment_ray.ops.relational import group_topk

        _tune_context()
        emb = _read(sf_dir, "embeddings")
        codes = ann.quantize_embeddings(emb).materialize()
        qdf = codes.map_batches(
            lambda d: d[d["vec_id"] % 131 == 0],
            batch_format="pandas").to_pandas()  # driver-small query set
        qdf = qdf.sort_values("vec_id")
        qids = qdf["vec_id"].to_numpy().astype(np.int64)
        Q = np.stack(qdf["qvec"].to_numpy()).astype(np.int64)
        qref = _ray.put((qids, Q))

        def cand(d: pd.DataFrame) -> pd.DataFrame:
            qi, Qm = _ray.get(qref)
            V = np.stack(d["qvec"].to_numpy()).astype(np.int64)
            dot = Qm @ V.T                       # (nq, b) exact ints
            l2 = ((Qm * Qm).sum(1)[:, None] + (V * V).sum(1)[None, :]
                  - 2 * dot)
            return pd.DataFrame({
                "query_id": np.repeat(qi, len(d)),
                "vec_id": np.tile(d["vec_id"].to_numpy().astype(np.int64),
                                  len(qi)),
                "dot": dot.ravel(),
                "l2": l2.ravel(),
            })

        cands = codes.map_batches(cand, batch_format="pandas")
        ra = group_topk(cands, key="query_id", order_col="dot", k=20,
                        tie_col="vec_id", descending=True, with_rank=True)
        rb = group_topk(cands, key="query_id", order_col="l2", k=20,
                        tie_col="vec_id", descending=False, with_rank=True)
        fused = ann.rrf_fuse([ra, rb], query_col="query_id",
                             item_col="vec_id", rank_col="rank", topk=10)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "query_id": df["query_id"].astype("int64"),
                "vec_id": df["vec_id"].astype("int64"),
                "rrf": df["rrf"].astype("int64"),
                "rank": df["rank"].astype("int64"),
            })

        return fused.map_batches(finalize, batch_format="pandas")

    def ann_ivf_appended(sf_dir):
        """Incremental IVF ingest (ops/ann.append_ivf): the index is
        built on 80% of the vectors, the held-out 20% (including the
        query vector's id-0 row) appended against the PERSISTED
        centroids — no refit, no re-shuffle of existing cells — then
        the standard nprobe-4 probe runs over the combined files.  The
        oracle replays probe + exact cosine over the appended index's
        own parquet, so a mis-assigned or missing appended vector
        surfaces as a wrong row."""
        import shutil

        _tune_context()
        emb = _read(sf_dir, "embeddings")
        q = emb.filter(expr="vec_id == 0").take(1)[0]["embedding"]
        ipath = _ivf_index_path(_corpus_entities(sf_dir)) + "_app"
        shutil.rmtree(ipath, ignore_errors=True)
        base = emb.map_batches(lambda d: d[d["vec_id"] % 5 != 0],
                               batch_format="pandas")
        newer = emb.map_batches(lambda d: d[d["vec_id"] % 5 == 0],
                                batch_format="pandas")
        idx = ann.build_ivf(base, ncells=8, index_path=ipath)
        ann.append_ivf(ipath, newer)
        return idx.search(np.asarray(q), k=10, nprobe=4)[["vec_id"]]

    def embedding_dup_pairs_q(sf_dir):
        # testdata embeddings are near-orthogonal (max offdiag cosine
        # ~0.51 at sf0.01), so the near-dup threshold sits below that.
        # EXACT distributed brute force (block x broadcast matrix) — the
        # DuckDB all-pairs oracle checks it value-for-value.
        _tune_context()
        return dedup.exact_cosine_pairs(
            _read(sf_dir, "embeddings"), threshold=0.4
        ).select_columns(["id_a", "id_b"])

    def embedding_dup_pairs_lsh(sf_dir):
        # the approximate scale path (random-hyperplane LSH buckets);
        # value-checked: the DuckDB oracle replays the same RandomState(7)
        # plane matrix, so band buckets (and misses) agree exactly
        _tune_context()
        return dedup.embedding_dup_pairs(
            _read(sf_dir, "embeddings"), threshold=0.4, nplanes=8, nbands=4
        ).select_columns(["id_a", "id_b"])

    def semdedup_pairs_q(sf_dir):
        """SemDeDup candidate pairs (k-means cells -> within-cell exact
        cosine; ops/dedup.semdedup_pairs).  Value-oracled: the index is
        PERSISTED cell-partitioned parquet, so the DuckDB SQL replays
        the assignment from disk and the within-cell self-join
        exactly."""
        import shutil

        _tune_context()
        emb = _read(sf_dir, "embeddings")
        ipath = _semdedup_index_path(_corpus_entities(sf_dir))
        shutil.rmtree(ipath, ignore_errors=True)
        return dedup.semdedup_pairs(
            emb, ncells=8, threshold=0.4, index_path=ipath
        ).select_columns(["id_a", "id_b"])

    def semdedup_keep_q(sf_dir):
        """SemDeDup keep set (smallest-id member of every within-cell
        duplicate relation survives; ops/dedup.semantic_dedup)."""
        import shutil

        _tune_context()
        emb = _read(sf_dir, "embeddings")
        ipath = _semdedup_index_path(_corpus_entities(sf_dir))
        shutil.rmtree(ipath, ignore_errors=True)
        return dedup.semantic_dedup(
            emb, ncells=8, threshold=0.4, index_path=ipath)

    def semdedup_clusters_q(sf_dir):
        """SemDeDup duplicate CLUSTERS: union-find over the within-cell
        cosine pairs, canonical = min id of the component
        (ops/dedup.semdedup_clusters).  Oracled by WITH RECURSIVE
        transitive closure over the persisted-index pair replay."""
        import shutil

        _tune_context()
        emb = _read(sf_dir, "embeddings")
        ipath = _semdedup_index_path(_corpus_entities(sf_dir))
        shutil.rmtree(ipath, ignore_errors=True)
        return dedup.semdedup_clusters(
            emb, ncells=8, threshold=0.4, index_path=ipath)

    def embedding_quantized(sf_dir):
        """Symmetric per-vector int8 quantization in long (vec_id, dim,
        qval, scale) form (ops/ann.quantize_embeddings — the 4x
        shuffle-byte reducer for embedding pipelines; stateless map,
        no shuffle)."""
        from aml_entity_resolution_assignment_ray.ops.ann import quantize_embeddings

        _tune_context()
        return quantize_embeddings(
            _read(sf_dir, "embeddings").select_columns(
                ["vec_id", "embedding"]), long_form=True)

    def embedding_gram(sf_dir):
        """Exact Gram matrix G = Q^T Q over the int8-quantized
        embeddings, upper triangle in long (i, j, sum_qq) form
        (ops/ann.gram_matrix_q8): one d x d int64 matmul partial per
        block, driver-side fold of #blocks x d(d+1)/2 tiny rows —
        the X^T X building block of PCA/whitening at corpus scale,
        integer-exact so it is layout-invariant and SQL-replayable."""
        from aml_entity_resolution_assignment_ray.ops.ann import gram_matrix_q8

        _tune_context()
        return gram_matrix_q8(
            _read(sf_dir, "embeddings").select_columns(
                ["vec_id", "embedding"]))

    def embedding_projection(sf_dir):
        """Johnson-Lindenstrauss +-1 random projection of the
        int8-quantized embeddings to 8 components (ops/ann.
        random_projection_q8): one int64 matmul per block, no shuffle,
        integer-exact — the oracle replays it from the literal sign
        matrix (the GBDT model-in-the-SQL convention)."""
        from aml_entity_resolution_assignment_ray.ops.ann import (
            random_projection_q8,
        )

        _tune_context()
        return random_projection_q8(
            _read(sf_dir, "embeddings").select_columns(
                ["vec_id", "embedding"]), k=8, seed=7, dim=64)

    def embedding_pca2(sf_dir):
        """PCA to 2 components (ops/ann.pca_project): one distributed
        pass of per-block (n, sum, X^T X) moment partials, a driver-
        trivial d x d eigh with a fixed sign convention, then a
        stateless broadcast projection map.  The eigen FIT is not
        SQL-expressible (pinned by the numpy oracle in
        tests/test_ops.py); the fitted (mean, W) persist to parquet
        and the SQL oracle replays the PROJECTION from them — the
        model-as-input convention, cf. embedding_kmeans_cells."""
        from aml_entity_resolution_assignment_ray.ops.ann import pca_project

        _tune_context()
        return pca_project(
            _read(sf_dir, "embeddings").select_columns(
                ["vec_id", "embedding"]), k=2,
            components_path=_pca_path(_corpus_entities(sf_dir)))

    def embedding_kmeans_cells(sf_dir):
        """Distributed Lloyd's k-means over every embedding (ops/ann.
        kmeans_fit: per-iteration per-block (cell, count, sum) moment
        partials — no shuffle, driver state is #blocks x k rows —
        smallest-id deterministic init), then the stateless broadcast
        assignment.  The fitted centroids persist to parquet and the
        oracle replays the argmin assignment from them (the
        model-as-input convention, cf. er_classified)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from aml_entity_resolution_assignment_ray.ops.ann import (
            kmeans_assign,
            kmeans_fit,
        )

        _tune_context()
        emb = _read(sf_dir, "embeddings").select_columns(
            ["vec_id", "embedding"])
        C = kmeans_fit(emb, k=8, iters=10)
        path = _kmeans_path(_corpus_entities(sf_dir))
        os.makedirs(path, exist_ok=True)
        pq.write_table(
            pa.table({"cell": pa.array(range(len(C)), pa.int64()),
                      "centroid": pa.array([list(map(float, c)) for c in C],
                                           pa.list_(pa.float64()))}),
            os.path.join(path, "centroids.parquet"))
        return kmeans_assign(emb, C)

    def embedding_norms(sf_dir):
        _tune_context()
        emb = _read(sf_dir, "embeddings").select_columns(["vec_id", "embedding"])

        def norms(df: pd.DataFrame) -> pd.DataFrame:
            V = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            return pd.DataFrame({
                "vec_id": df["vec_id"],
                "l2_norm": _round_half_away(np.sqrt((V * V).sum(axis=1)), 4),
            })

        return emb.map_batches(norms, batch_format="pandas")

    def label_centroids(sf_dir):
        """Per-label embedding centroids in long (label, dim, centroid)
        form (ops/ann.grouped_centroids — per-batch vector-sum
        combiner, one keyed shuffle; class prototypes for few-shot /
        cluster-summary use)."""
        from aml_entity_resolution_assignment_ray.ops.ann import grouped_centroids

        _tune_context()
        out = grouped_centroids(
            _read(sf_dir, "embeddings").select_columns(
                ["label", "embedding"]), key="label")

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "label": df["label"].astype("int64"),
                "dim": df["dim"].astype("int64"),
                "centroid": _round_half_away(df["centroid"], 6),
            })

        return out.map_batches(finalize, batch_format="pandas")

    # ---- multimodal plumbing (stubbed decode, real Ray plumbing) ----

    def media_features(sf_dir):
        """Decode (deterministic fake codec) -> persist the decoded pixel
        tensors -> nearest-neighbor resize -> channel/luminance features,
        VALUE-ORACLED: the DuckDB SQL replays the resize index arithmetic
        and the integer-exact feature math over the persisted decode
        output (the same replay-the-downstream pattern as the er_*
        oracles over the synth corpus)."""
        _tune_context()
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from aml_entity_resolution_assignment_ray.ops import multimodal as mm

        media = rd.from_arrow(mm.make_fake_media_table(n=48))
        images = media.filter(expr="mime == 'image/png'")
        decoded = mm.decode_images(images, fake=True).materialize()

        dec_df = decoded.to_pandas()  # 16 rows — driver-small by design
        os.makedirs("/tmp/er_media", exist_ok=True)
        pq.write_table(pa.table({
            "media_id": pa.array(dec_df["media_id"], pa.string()),
            "pixels": pa.array([np.asarray(p, dtype=np.int32).tolist()
                                for p in dec_df["pixels"]],
                               pa.list_(pa.int32())),
            "shape": pa.array([list(map(int, s)) for s in dec_df["shape"]],
                              pa.list_(pa.int64())),
        }), "/tmp/er_media/decoded.parquet")

        feats = mm.image_features(mm.resize_images(decoded), as_columns=True)

        def rounded(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({"media_id": df["media_id"]})
            for c in mm.ImageFeatures.FEATURE_COLS:
                out[c] = _round_half_away(df[c], 6)
            return out

        return feats.map_batches(rounded, batch_format="pandas")

    def image_ahash(sf_dir):
        """8x8 average-hash bit vectors — the image near-duplicate
        signature (ops/multimodal.AHashBits: ResizeImage floor-index
        arithmetic, integer BT.601 gray, 64*gray > sum threshold —
        no division, so the SQL oracle replays every bit from the
        persisted decode)."""
        _tune_context()
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from aml_entity_resolution_assignment_ray.ops import multimodal as mm

        media = rd.from_arrow(mm.make_fake_media_table(n=48))
        images = media.filter(expr="mime == 'image/png'")
        decoded = mm.decode_images(images, fake=True).materialize()

        dec_df = decoded.to_pandas()  # 16 rows — driver-small by design
        os.makedirs("/tmp/er_media", exist_ok=True)
        pq.write_table(pa.table({
            "media_id": pa.array(dec_df["media_id"], pa.string()),
            "pixels": pa.array([np.asarray(p, dtype=np.int32).tolist()
                                for p in dec_df["pixels"]],
                               pa.list_(pa.int32())),
            "shape": pa.array([list(map(int, s)) for s in dec_df["shape"]],
                              pa.list_(pa.int64())),
        }), "/tmp/er_media/ahash_decoded.parquet")

        return mm.image_ahash_bits(decoded)

    def audio_features(sf_dir):
        """REAL WAV decode (in-repo RIFF/PCM codec, strict mode — no
        fake) -> persist the decoded sample tensors -> integer-exact
        audio features (duration/mean/rms/peak/zero-crossings),
        VALUE-ORACLED: the DuckDB SQL unnests the persisted samples and
        reproduces every feature bit-for-bit (see AudioFeatures
        docstring)."""
        _tune_context()
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from aml_entity_resolution_assignment_ray.ops import multimodal as mm

        audio = rd.from_arrow(mm.make_audio_table(n=32))
        decoded = mm.decode_audio(audio, fake=False).materialize()

        dec_df = decoded.to_pandas()  # 32 rows — driver-small by design
        os.makedirs("/tmp/er_media", exist_ok=True)
        pq.write_table(pa.table({
            "media_id": pa.array(dec_df["media_id"], pa.string()),
            "samples": pa.array([np.asarray(s, dtype=np.int32).tolist()
                                 for s in dec_df["samples"]],
                                pa.list_(pa.int32())),
            "n_samples": pa.array(dec_df["n_samples"], pa.int64()),
            "channels": pa.array(dec_df["channels"], pa.int64()),
            "sample_rate": pa.array(dec_df["sample_rate"], pa.int64()),
        }), "/tmp/er_media/audio_decoded.parquet")

        feats = mm.audio_features(decoded)

        def rounded(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            for c in ["duration_sec", "mean_amp", "rms", "peak"]:
                out[c] = _round_half_away(out[c], 6)
            return out

        return feats.map_batches(rounded, batch_format="pandas")

    def audio_frames(sf_dir):
        """Frame-level audio energy (windowed RMS over channel 0, the
        VAD/silence-trim contour): REAL WAV decode -> persist ->
        per-256-sample-frame RMS, VALUE-ORACLED by grouping the
        persisted samples in SQL."""
        _tune_context()
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from aml_entity_resolution_assignment_ray.ops import multimodal as mm

        audio = rd.from_arrow(mm.make_audio_table(n=32))
        decoded = mm.decode_audio(audio, fake=False).materialize()

        dec_df = decoded.to_pandas()  # 32 rows — driver-small by design
        os.makedirs("/tmp/er_media", exist_ok=True)
        pq.write_table(pa.table({
            "media_id": pa.array(dec_df["media_id"], pa.string()),
            "samples": pa.array([np.asarray(s, dtype=np.int32).tolist()
                                 for s in dec_df["samples"]],
                                pa.list_(pa.int32())),
            "channels": pa.array(dec_df["channels"], pa.int64()),
        }), "/tmp/er_media/audio_frames_decoded.parquet")

        frames = mm.audio_frame_energy(decoded, frame=256)

        def rounded(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out["frame_rms"] = _round_half_away(out["frame_rms"], 6)
            return out

        return frames.map_batches(rounded, batch_format="pandas")

    def video_frames(sf_dir):
        """REAL strict-mode video frame sampling: Y4M payloads decoded
        at computed frame offsets (only the k sampled frames are ever
        read — ops/multimodal.SampleFrames strict path), then
        integer-exact per-frame luma stats.  VALUE-ORACLED twice over:
        the SQL replays the (i * n_frames) // k sampling arithmetic
        from the persisted metadata (a LEFT JOIN so a mis-sampled
        frame surfaces as NULL stats, not a dropped row) AND the stat
        math over the persisted decoded pixels."""
        _tune_context()
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from aml_entity_resolution_assignment_ray.ops import multimodal as mm

        table = mm.make_video_table(n=8)
        os.makedirs("/tmp/er_media", exist_ok=True)
        pq.write_table(
            pa.table({"media_id": table["media_id"],
                      "n_frames": table["n_frames"]}),
            "/tmp/er_media/video_meta.parquet")
        frames = mm.sample_frames(rd.from_arrow(table), k=3,
                                  fake=False).materialize()
        dec_df = frames.to_pandas()   # 24 rows — driver-small by design
        pq.write_table(pa.table({
            "media_id": pa.array(dec_df["media_id"], pa.string()),
            "frame_idx": pa.array(dec_df["frame_idx"], pa.int64()),
            "pixels": pa.array([np.asarray(p, dtype=np.int32).tolist()
                                for p in dec_df["pixels"]],
                               pa.list_(pa.int32())),
        }), "/tmp/er_media/video_frames_decoded.parquet")

        def fstats(df: pd.DataFrame) -> pd.DataFrame:
            px = [np.asarray(p, dtype=np.int64) for p in df["pixels"]]
            lens = np.array([len(p) for p in px], dtype=np.int64)
            flat = (np.concatenate(px) if len(px)
                    else np.array([], dtype=np.int64))
            starts = np.cumsum(lens) - lens
            return pd.DataFrame({
                "media_id": df["media_id"],
                "frame_idx": df["frame_idx"].astype("int64"),
                "mean_luma": _round_half_away(
                    np.add.reduceat(flat, starts) / lens, 6),
                "max_luma": np.maximum.reduceat(flat, starts),
                "min_luma": np.minimum.reduceat(flat, starts),
                "n_pixels": lens,
            })

        return frames.map_batches(fstats, batch_format="pandas")

    def video_motion(sf_dir):
        """Per-frame motion signal (mean |luma diff| vs the previous
        sampled frame — ops/multimodal.frame_motion over the strict
        Y4M sample): SQL replays the pairwise diff over the persisted
        decoded frames via a lag() window on the list column."""
        _tune_context()
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from aml_entity_resolution_assignment_ray.ops import multimodal as mm

        frames = mm.sample_frames(
            rd.from_arrow(mm.make_video_table(n=8)), k=3,
            fake=False).materialize()
        dec_df = frames.to_pandas()   # 24 rows — driver-small by design
        os.makedirs("/tmp/er_media", exist_ok=True)
        pq.write_table(pa.table({
            "media_id": pa.array(dec_df["media_id"], pa.string()),
            "frame_idx": pa.array(dec_df["frame_idx"], pa.int64()),
            "pixels": pa.array([np.asarray(p, dtype=np.int32).tolist()
                                for p in dec_df["pixels"]],
                               pa.list_(pa.int32())),
        }), "/tmp/er_media/video_motion_decoded.parquet")
        return mm.frame_motion(frames)

    def video_mp4_samples(sf_dir):
        """REAL MP4 container parse + frame-sample extraction
        (ops/multimodal.ExtractVideoSamples): the ISO BMFF sample
        table (box walk, stts/stsz/stsc/stco expansion) locates the k
        evenly spaced samples and ONLY their byte ranges are sliced
        from mdat.  Value-oracled end to end against a truth table the
        GENERATOR wrote (per-sample pts/size/byte-sum, independent of
        the parser) joined on the replayed (i * n) // k sampling
        arithmetic — a LEFT JOIN so a mis-parsed sample surfaces as
        NULL stats, not a dropped row."""
        _tune_context()
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from aml_entity_resolution_assignment_ray.ops import multimodal as mm

        table, truth = mm.make_mp4_table(n=8, with_truth=True)
        os.makedirs("/tmp/er_media", exist_ok=True)
        pq.write_table(
            pa.table({"media_id": table["media_id"],
                      "n_frames": table["n_frames"]}),
            "/tmp/er_media/mp4_meta.parquet")
        pq.write_table(pa.Table.from_pandas(truth),
                       "/tmp/er_media/mp4_truth.parquet")
        res = mm.extract_video_samples(rd.from_arrow(table), k=3,
                                       fake=False)

        def stats(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "media_id": df["media_id"],
                "frame_idx": df["frame_idx"].astype("int64"),
                "pts": df["pts"].astype("int64"),
                "timescale": df["timescale"].astype("int64"),
                "codec": df["codec"],
                "n_bytes": pd.array([len(s) for s in df["sample"]],
                                    dtype="int64"),
                "byte_sum": pd.array(
                    [int(np.frombuffer(s, np.uint8).sum(dtype=np.int64))
                     for s in df["sample"]], dtype="int64"),
            })

        return res.map_batches(stats, batch_format="pandas")

    def media_meta(sf_dir):
        """Binary-payload plumbing, value-checked: the fake media table
        is written to parquet, read back through Ray as binary-typed
        batches, and digested per row — the oracle recomputes the md5
        in DuckDB over the same file."""
        _tune_context()
        import ray.data as rd

        from aml_entity_resolution_assignment_ray.ops import multimodal as mm

        os.makedirs("/tmp/er_media", exist_ok=True)
        import pyarrow.parquet as pq

        pq.write_table(mm.make_fake_media_table(n=48),
                       "/tmp/er_media/media.parquet")

        def digest(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "media_id": df["media_id"],
                "mime": df["mime"],
                "n_bytes": df["payload"].map(len).astype("int64"),
                "payload_hex": df["payload"].map(
                    lambda b: bytes(b).hex().upper()),
                "width": df["width"].astype("int64"),
                "height": df["height"].astype("int64"),
            })

        return rd.read_parquet("/tmp/er_media/media.parquet") \
            .map_batches(digest, batch_format="pandas")

    # ---- ER pipeline (flagship; rows-only checks) ----

    def er_profiles(sf_dir):
        n = _corpus_entities(sf_dir)
        _write_oracle_corpus(n)  # same transcripts, on disk for DuckDB
        return _flagship(n)["profiles"] \
            .select_columns(["conv_id", "n_turns", "norm_first_name",
                             "norm_last_name", "norm_email", "norm_phone",
                             "norm_nid", "norm_dob"])

    def er_email_consistency(sf_dir):
        """Cross-field consistency audit over the extracted profiles:
        does the email LOCAL PART contain the alnum-stripped first or
        last name (>= 3 chars)?  The data-quality signal that catches
        noise-corrupted / swapped emails; per-profile boolean over the
        flagship profiles Dataset, replayed by the same strpos logic
        on the oracled profiles CTE."""
        import re as _re

        _tune_context()
        n = _corpus_entities(sf_dir)
        _write_oracle_corpus(n)
        profiles = _flagship(n)["profiles"].select_columns(
            ["conv_id", "norm_first_name", "norm_last_name",
             "norm_email"])
        strip = _re.compile(r"[^a-z0-9]")

        def audit(d: pd.DataFrame) -> pd.DataFrame:
            local = (d["norm_email"].fillna("").astype(str)
                     .str.split("@").str[0])
            fn = (d["norm_first_name"].fillna("").astype(str)
                  .str.replace(strip, "", regex=True))
            ln = (d["norm_last_name"].fillna("").astype(str)
                  .str.replace(strip, "", regex=True))
            ok = [((len(f) >= 3 and f in lo) or (len(l) >= 3 and l in lo))
                  for f, l, lo in zip(fn, ln, local)]
            return pd.DataFrame({
                "conv_id": d["conv_id"],
                "email_name_consistent": np.asarray(ok, dtype=bool)})

        return profiles.map_batches(audit, batch_format="pandas")

    def er_turn_context(sf_dir):
        """Rolling context-window assembly over the transcript corpus
        (ops/text.rolling_context): every turn paired with its previous
        2 same-conversation turns joined by newline — the context ->
        next-turn training-example constructor, ONE conv shuffle and k
        grouped shifts, matching the SQL string_agg frame exactly."""
        from aml_entity_resolution_assignment_ray.ops.text import (
            rolling_context,
        )

        _tune_context()
        n = _corpus_entities(sf_dir)
        _write_oracle_corpus(n)
        transcripts, _ = _corpus(n)
        res = rolling_context(
            transcripts.select_columns(["conv_id", "turn_idx", "text"]),
            key="conv_id", order_cols=["turn_idx"], text_col="text",
            k=2)
        return res.map_batches(
            lambda d: pd.DataFrame({
                "conv_id": d["conv_id"],
                "turn_idx": d["turn_idx"].astype(np.int64),
                "context": d["context"]}),
            batch_format="pandas")

    def er_turn_collapse(sf_dir):
        """Transcript stutter removal: drop every turn whose text
        exactly repeats the previous turn of the SAME conversation
        (consecutive-duplicate collapse — the transcript-cleaning pass
        that precedes context assembly).  ops/relational.grouped_lag
        on (conv_id, turn_idx), then a vectorized prev != cur filter;
        each conversation's first turn always survives, matching the
        SQL LAG window's NULL rows."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            grouped_lag,
        )

        _tune_context()
        n = _corpus_entities(sf_dir)
        _write_oracle_corpus(n)
        transcripts, _ = _corpus(n)
        lagged = grouped_lag(
            transcripts.select_columns(["conv_id", "turn_idx", "text"]),
            key="conv_id", order_cols=["turn_idx"], cols=["text"])

        def keep(d: pd.DataFrame) -> pd.DataFrame:
            prev = d["prev_text"]
            m = prev.isna() | (d["text"] != prev)
            k = d[m]
            return pd.DataFrame({
                "conv_id": k["conv_id"],
                "turn_idx": k["turn_idx"].astype(np.int64),
                "text": k["text"]})

        return lagged.map_batches(keep, batch_format="pandas")

    def er_dialogue_stats(sf_dir):
        """Per-conversation dialogue-shape statistics over the
        transcript corpus: turn count, role switches (turns whose role
        differs from the previous turn's), tool-call turns, total
        text chars — the conversational-data profiling pass.  ONE
        hash shuffle on conv_id (conversations arrive block-complete,
        the er_profiles partitioning contract), then a vectorized
        per-block grouped pass; all exact integers."""
        from aml_entity_resolution_assignment_ray.config import EngineConfig
        from aml_entity_resolution_assignment_ray.ops.relational import _keyed

        _tune_context()
        n = _corpus_entities(sf_dir)
        _write_oracle_corpus(n)
        transcripts, _ = _corpus(n)

        def stats(d: pd.DataFrame) -> pd.DataFrame:
            if not len(d):
                return pd.DataFrame({
                    "conv_id": pd.Series([], dtype=str),
                    "n_turns": pd.Series([], dtype=np.int64),
                    "n_role_switches": pd.Series([], dtype=np.int64),
                    "n_tool_turns": pd.Series([], dtype=np.int64),
                    "n_chars": pd.Series([], dtype=np.int64)})
            s = d.sort_values(["conv_id", "turn_idx"], kind="stable")
            g = s.groupby("conv_id", sort=False)
            prev = g["role"].shift(1)
            s = s.assign(
                _switch=(prev.notna()
                         & (s["role"] != prev)).astype(np.int64),
                _tool=s["tool"].notna().astype(np.int64),
                _chars=s["text"].fillna("").str.len().astype(np.int64),
            )
            a = s.groupby("conv_id", sort=False).agg(
                n_turns=("turn_idx", "size"),
                n_role_switches=("_switch", "sum"),
                n_tool_turns=("_tool", "sum"),
                n_chars=("_chars", "sum")).reset_index()
            for c in ["n_turns", "n_role_switches", "n_tool_turns",
                      "n_chars"]:
                a[c] = a[c].astype(np.int64)
            return a

        keyed = _keyed(
            transcripts.select_columns(
                ["conv_id", "turn_idx", "role", "tool", "text"]),
            ["conv_id"], EngineConfig(), None)
        return keyed.map_batches(stats, batch_format="pandas",
                                 batch_size=None)

    def er_sft_pairs(sf_dir):
        """SFT training-pair extraction from transcripts: for every
        assistant turn, prompt = the previous <=3 turns formatted as
        'role: text' lines (the turn's OWN text excluded —
        ops/text.rolling_context with include_current=False), response
        = the turn text.  A leading assistant turn with no prior
        context gets a SQL-NULL prompt, matching the window's empty
        frame."""
        _tune_context()
        n = _corpus_entities(sf_dir)
        _write_oracle_corpus(n)
        transcripts, _ = _corpus(n)

        def lines(d: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "conv_id": d["conv_id"],
                "turn_idx": d["turn_idx"].astype(np.int64),
                "role": d["role"],
                "text": d["text"].fillna(""),
                "line": d["role"].astype(str) + ": "
                        + d["text"].fillna("").astype(str),
            })

        ctx = text.rolling_context(
            transcripts.select_columns(
                ["conv_id", "turn_idx", "role", "text"]).map_batches(
                lines, batch_format="pandas"),
            key="conv_id", order_cols=["turn_idx"], text_col="line",
            k=3, include_current=False, out_col="prompt")

        def finalize(d: pd.DataFrame) -> pd.DataFrame:
            a = d[d["role"] == "assistant"]
            return pd.DataFrame({
                "conv_id": a["conv_id"],
                "turn_idx": a["turn_idx"].astype(np.int64),
                "prompt": a["prompt"],
                "response": a["text"].astype(str),
            })

        return ctx.map_batches(finalize, batch_format="pandas")

    def er_response_latency(sf_dir):
        """Assistant response-latency stats per conversation: for
        every user->assistant adjacent turn pair, the event-time gap
        in exact integer microseconds; per conv the exchange count,
        total and max latency (convs with no such pair are absent,
        the SQL-join-natural shape).  ONE conv-keyed shuffle + a
        vectorized grouped shift."""
        from aml_entity_resolution_assignment_ray.config import EngineConfig
        from aml_entity_resolution_assignment_ray.ops.relational import _keyed

        _tune_context()
        n = _corpus_entities(sf_dir)
        _write_oracle_corpus(n)
        transcripts, _ = _corpus(n)

        def stats(d: pd.DataFrame) -> pd.DataFrame:
            if not len(d):
                return pd.DataFrame({
                    "conv_id": pd.Series([], dtype=str),
                    "n_exchanges": pd.Series([], dtype=np.int64),
                    "total_latency_us": pd.Series([], dtype=np.int64),
                    "max_latency_us": pd.Series([], dtype=np.int64)})
            s = d.sort_values(["conv_id", "turn_idx"], kind="stable")
            g = s.groupby("conv_id", sort=False)
            tus = (s["ts"].astype("datetime64[ns]").astype("int64")
                   // 1000)
            prev_role = g["role"].shift(1)
            prev_tus = tus.groupby(s["conv_id"], sort=False).shift(1)
            m = ((s["role"] == "assistant")
                 & (prev_role == "user")).to_numpy()
            lat = (tus - prev_tus).to_numpy()[m].astype(np.int64)
            conv = s["conv_id"].to_numpy()[m]
            a = (pd.DataFrame({"conv_id": conv, "lat": lat})
                 .groupby("conv_id", sort=False)["lat"]
                 .agg(["size", "sum", "max"]).reset_index())
            return pd.DataFrame({
                "conv_id": a["conv_id"],
                "n_exchanges": a["size"].astype(np.int64),
                "total_latency_us": a["sum"].astype(np.int64),
                "max_latency_us": a["max"].astype(np.int64),
            })

        keyed = _keyed(
            transcripts.select_columns(
                ["conv_id", "turn_idx", "role", "ts"]),
            ["conv_id"], EngineConfig(), None)
        return keyed.map_batches(stats, batch_format="pandas",
                                 batch_size=None)

    def er_conv_dedup(sf_dir):
        """Conversation-level exact dedup: each conversation assembles
        to one ordered 'role: text' document (ONE conv_id-keyed
        shuffle, the er_profiles partitioning), then the standard
        digest dedup keeps the smallest conv_id per identical
        dialogue — replayed-conversation removal for transcript
        corpora.  String conv ids dedup on the text digest exactly
        like doc ids (ops/dedup.exact_dedup's shape, id min by
        lexicographic order)."""
        from aml_entity_resolution_assignment_ray.config import EngineConfig
        from aml_entity_resolution_assignment_ray.ops.relational import _keyed

        _tune_context()
        n = _corpus_entities(sf_dir)
        _write_oracle_corpus(n)
        transcripts, _ = _corpus(n)

        def assemble(d: pd.DataFrame) -> pd.DataFrame:
            if not len(d):
                return pd.DataFrame({
                    "conv_id": pd.Series([], dtype=str),
                    "dialogue": pd.Series([], dtype=str)})
            s = d.sort_values(["conv_id", "turn_idx"], kind="stable")
            line = (s["role"].astype(str) + ": "
                    + s["text"].fillna("").astype(str))
            g = pd.DataFrame({"conv_id": s["conv_id"], "line": line}) \
                .groupby("conv_id", sort=False)["line"] \
                .agg(lambda x: "\n".join(x)).reset_index()
            return g.rename(columns={"line": "dialogue"})

        convs = _keyed(
            transcripts.select_columns(["conv_id", "turn_idx", "role",
                                        "text"]),
            ["conv_id"], EngineConfig(), None).map_batches(
            assemble, batch_format="pandas", batch_size=None)

        def to_digest(d: pd.DataFrame) -> pd.DataFrame:
            import hashlib

            return pd.DataFrame({
                "dig": [hashlib.md5(t.encode("utf-8")).hexdigest()
                        for t in d["dialogue"]],
                "conv_id": d["conv_id"],
                "n_dialogue_chars": d["dialogue"].str.len()
                .astype(np.int64),
            })

        def digest_min(d: pd.DataFrame) -> pd.DataFrame:
            return (d.sort_values(["dig", "conv_id"], kind="stable")
                    .groupby("dig", sort=False).head(1))

        canon_ds = (convs.map_batches(to_digest, batch_format="pandas")
                    .map_batches(digest_min, batch_format="pandas")
                    .repartition(EngineConfig().resolve_join_partitions(),
                                 keys=["dig"])
                    .map_batches(digest_min, batch_format="pandas",
                                 batch_size=None))
        return canon_ds.map_batches(
            lambda d: pd.DataFrame({
                "conv_id": d["conv_id"],
                "n_dialogue_chars": d["n_dialogue_chars"]
                .astype(np.int64)}),
            batch_format="pandas")

    def er_pairs(sf_dir):
        n = _corpus_entities(sf_dir)
        _write_oracle_corpus(n)  # the full-pair DuckDB oracle reads it
        return _flagship(n)["pairs"]

    def er_pairs_exact_keys(sf_dir):
        """Pair engine over the four exact keys only (B2-B5) — the
        SQL-expressible slice of candidate generation, value-oracled."""
        from aml_entity_resolution_assignment_ray.stages.block import emit_keys
        from aml_entity_resolution_assignment_ray.stages.pairs import generate_pairs

        n = _corpus_entities(sf_dir)
        _write_oracle_corpus(n)
        norm = _flagship(n)["profiles"]
        keys = emit_keys(norm, EngineConfig()).filter(
            expr="key_type != 'minhash'")
        return generate_pairs(keys, EngineConfig(),
                              n_rows=norm.count() * 4)

    def er_classified(sf_dir):
        n = _corpus_entities(sf_dir)
        _write_oracle_corpus(n)
        return _flagship(n)["classified"] \
            .select_columns(["id_a", "id_b", "match_type", "is_match"])

    def er_score_calibration(sf_dir):
        """Model-score calibration table over the flagship scorer:
        candidate pairs bucketed by floor(ml_prob * 10) (clamped to
        bucket 9), each bucket's pair count, true-match count (truth
        join via stages/evaluate.label_pairs' broadcast-or-join gate)
        and empirical match rate — the reliability-diagram input that
        tells an ER operator whether 0.8 means 80%.  Counts are exact;
        match_rate's only float step is the final cast-divide; bucket
        edges are deterministic because the oracle's compiled-GBDT ml
        replays the engine's ml_prob bit-for-bit."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            keyed_sum,
        )
        from aml_entity_resolution_assignment_ray.stages.evaluate import (
            label_pairs,
        )

        _tune_context()
        n = _corpus_entities(sf_dir)
        _write_oracle_corpus(n)
        _, truth = _corpus(n)
        cls = _flagship(n)["classified"] \
            .select_columns(["id_a", "id_b", "ml_prob"])
        cfg = EngineConfig()
        labeled = label_pairs(cls, truth, cfg)

        def bucketize(d: pd.DataFrame) -> pd.DataFrame:
            ml = d["ml_prob"].to_numpy(np.float64)
            return pd.DataFrame({
                "bucket": np.minimum(np.floor(ml * 10.0), 9.0)
                    .astype(np.int64),
                "n_pairs": np.ones(len(d), dtype=np.int64),
                "n_true": d["label"].to_numpy(np.int64)})

        agg = keyed_sum(labeled.map_batches(bucketize,
                                            batch_format="pandas"),
                        ["bucket"], ["n_pairs", "n_true"], cfg)
        return agg.map_batches(
            lambda d: d.assign(match_rate=np.array(
                [float(int(t)) / float(int(p)) for t, p in
                 zip(d["n_true"], d["n_pairs"])], dtype=np.float64)),
            batch_format="pandas")

    def er_name_cosine(sf_dir):
        """Embedding-cosine similarity per candidate pair (the scorer's
        name_cosine feature — feature-hashed shingle embeddings)."""
        n = _corpus_entities(sf_dir)
        _write_oracle_corpus(n)

        def finalize(df):
            return pd.DataFrame({
                "id_a": df["id_a"], "id_b": df["id_b"],
                "name_cosine": _round_half_away(df["name_cosine"], 4),
            })

        return _flagship(n)["classified"] \
            .select_columns(["id_a", "id_b", "name_cosine"]) \
            .map_batches(finalize, batch_format="pandas")

    def er_clusters(sf_dir):
        n = _corpus_entities(sf_dir)
        _write_oracle_corpus(n)
        return _flagship(n)["predictions"]

    def er_eval_metrics(sf_dir):
        n = _corpus_entities(sf_dir)
        _write_oracle_corpus(n)
        res = _flagship(n)
        pe, ce = res["pair_eval"], res["cluster_eval"]
        return pd.DataFrame([{
            "pair_precision": round(pe["precision"], 6),
            "pair_recall": round(pe["recall"], 6),
            "pair_f1": round(pe["f1"], 6),
            "cluster_precision": round(ce["precision"], 6),
            "cluster_recall": round(ce["recall"], 6),
            "cluster_f1": round(ce["f1"], 6),
        }])

    def event_hour_value_ols(sf_dir):
        """Per-type linear trend of event value (cents) on hour of day
        — ops/profile.grouped_ols: exact integer sufficient statistics
        through one keyed_sum shuffle, arbitrary-precision finalize,
        float64 only at the last cast/divide so DuckDB replays each
        output bit-for-bit from the same sums."""
        from aml_entity_resolution_assignment_ray.ops.profile import (
            grouped_ols,
        )

        _tune_context()
        ds = _read(sf_dir, "events").select_columns(
            ["event_type", "ts", "value"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_type": df["event_type"],
                "x": df["ts"].dt.hour.to_numpy(np.int64),
                "y": _round_half_away(
                    df["value"].to_numpy(np.float64) * 100)
                .astype(np.int64),
            })

        return grouped_ols(ds.map_batches(prep, batch_format="pandas"),
                           key="event_type", x_col="x", y_col="y")

    def supplier_pagerank(sf_dir):
        """PageRank over the customer->supplier purchase graph (edges
        from orders x lineitem) — ops/graph.pagerank: fixed-point
        integer power iteration, layout-invariant and replayed
        bit-for-bit by a generated per-round SQL CTE chain.  Suppliers
        accumulate rank from the customers who buy from them."""
        from aml_entity_resolution_assignment_ray.ops.graph import pagerank

        _tune_context()
        cfg = EngineConfig()
        nparts = cfg.resolve_join_partitions()

        orders = _read(sf_dir, "orders").select_columns(
            ["o_orderkey", "o_custkey"]).map_batches(
            lambda d: pd.DataFrame({
                "orderkey": d["o_orderkey"].astype(np.int64),
                "custkey": d["o_custkey"].astype(np.int64)}),
            batch_format="pandas")
        li = _read(sf_dir, "lineitem").select_columns(
            ["l_orderkey", "l_suppkey"]).map_batches(
            lambda d: pd.DataFrame({
                "orderkey": d["l_orderkey"].astype(np.int64),
                "suppkey": d["l_suppkey"].astype(np.int64)}),
            batch_format="pandas")
        ol = safe_join(li, orders, join_type="inner",
                       num_partitions=nparts, on=("orderkey",))
        edges = ol.map_batches(
            lambda d: pd.DataFrame({
                "src": "c" + d["custkey"].astype(np.int64).astype(str),
                "dst": "s" + d["suppkey"].astype(np.int64).astype(str)}),
            batch_format="pandas")
        ranks = pagerank(edges, iterations=3)
        return ranks.map_batches(
            lambda d: pd.DataFrame({"node": d["node"],
                                    "pr": d["rank"].astype(np.int64)}),
            batch_format="pandas")

    def cust_supp_communities(sf_dir):
        """Synchronous label-propagation communities over the same
        customer-supplier purchase graph (ops/graph.
        label_propagation): 3 fixed rounds of modal-neighbor-label
        adoption with smallest-label tie-break — deterministic,
        layout-invariant, and replayed by a generated per-round SQL
        CTE chain."""
        from aml_entity_resolution_assignment_ray.ops.graph import label_propagation

        _tune_context()
        cfg = EngineConfig()
        nparts = cfg.resolve_join_partitions()

        orders = _read(sf_dir, "orders").select_columns(
            ["o_orderkey", "o_custkey"]).map_batches(
            lambda d: pd.DataFrame({
                "orderkey": d["o_orderkey"].astype(np.int64),
                "custkey": d["o_custkey"].astype(np.int64)}),
            batch_format="pandas")
        li = _read(sf_dir, "lineitem").select_columns(
            ["l_orderkey", "l_suppkey"]).map_batches(
            lambda d: pd.DataFrame({
                "orderkey": d["l_orderkey"].astype(np.int64),
                "suppkey": d["l_suppkey"].astype(np.int64)}),
            batch_format="pandas")
        ol = safe_join(li, orders, join_type="inner",
                       num_partitions=nparts, on=("orderkey",))
        edges = ol.map_batches(
            lambda d: pd.DataFrame({
                "src": "c" + d["custkey"].astype(np.int64).astype(str),
                "dst": "s" + d["suppkey"].astype(np.int64).astype(str)}),
            batch_format="pandas")
        labels = label_propagation(edges, iterations=3)
        return labels.map_batches(
            lambda d: pd.DataFrame({"node": d["node"].astype(str),
                                    "label": d["label"].astype(str)}),
            batch_format="pandas")

    def cust_supp_kcore(sf_dir):
        """10-core of the customer-supplier purchase graph — the
        maximal subgraph where every node keeps >= 10 within-core
        neighbors (ops/graph.k_core: iterative peeling, one keyed_sum
        + two semi_joins per round, only the alive COUNT reaching the
        driver).  Exact integer degrees make the peel layout-invariant
        and replayed bit-for-bit by a generated per-round CTE chain."""
        from aml_entity_resolution_assignment_ray.ops.graph import k_core

        _tune_context()
        cfg = EngineConfig()
        nparts = cfg.resolve_join_partitions()

        orders = _read(sf_dir, "orders").select_columns(
            ["o_orderkey", "o_custkey"]).map_batches(
            lambda d: pd.DataFrame({
                "orderkey": d["o_orderkey"].astype(np.int64),
                "custkey": d["o_custkey"].astype(np.int64)}),
            batch_format="pandas")
        li = _read(sf_dir, "lineitem").select_columns(
            ["l_orderkey", "l_suppkey"]).map_batches(
            lambda d: pd.DataFrame({
                "orderkey": d["l_orderkey"].astype(np.int64),
                "suppkey": d["l_suppkey"].astype(np.int64)}),
            batch_format="pandas")
        ol = safe_join(li, orders, join_type="inner",
                       num_partitions=nparts, on=("orderkey",))
        edges = ol.map_batches(
            lambda d: pd.DataFrame({
                "a": "c" + d["custkey"].astype(np.int64).astype(str),
                "b": "s" + d["suppkey"].astype(np.int64).astype(str)}),
            batch_format="pandas")
        return k_core(edges, k=10, cfg=cfg)

    def supplier_bfs_hops(sf_dir):
        """Multi-source BFS hop distance (ops/graph.bfs_hops): every
        node of the customer-supplier purchase graph within 2 hops of
        the seed customers (custkey % 17 == 0) — the graph-proximity
        pruning primitive.  Per round: one hash join of the
        symmetrized edges against the frontier + one anti_join against
        the visited set; exact integer hops, replayed by a DuckDB
        recursive CTE with min(hop) over the bounded walk."""
        from aml_entity_resolution_assignment_ray.ops.graph import bfs_hops

        _tune_context()
        cfg = EngineConfig()
        nparts = cfg.resolve_join_partitions()

        orders = _read(sf_dir, "orders").select_columns(
            ["o_orderkey", "o_custkey"]).map_batches(
            lambda d: pd.DataFrame({
                "orderkey": d["o_orderkey"].astype(np.int64),
                "custkey": d["o_custkey"].astype(np.int64)}),
            batch_format="pandas")
        li = _read(sf_dir, "lineitem").select_columns(
            ["l_orderkey", "l_suppkey"]).map_batches(
            lambda d: pd.DataFrame({
                "orderkey": d["l_orderkey"].astype(np.int64),
                "suppkey": d["l_suppkey"].astype(np.int64)}),
            batch_format="pandas")
        ol = safe_join(li, orders, join_type="inner",
                       num_partitions=nparts, on=("orderkey",))
        edges = ol.map_batches(
            lambda d: pd.DataFrame({
                "a": "c" + d["custkey"].astype(np.int64).astype(str),
                "b": "s" + d["suppkey"].astype(np.int64).astype(str)}),
            batch_format="pandas")
        seeds = _read(sf_dir, "customer").select_columns(
            ["c_custkey"]).map_batches(
            lambda d: pd.DataFrame({
                "node": "c" + d["c_custkey"][
                    d["c_custkey"] % 17 == 0].astype(np.int64).astype(str)}),
            batch_format="pandas")
        return bfs_hops(edges, seeds, max_hops=2, cfg=cfg)

    def supplier_adamic_adar(sf_dir):
        """Adamic-Adar link prediction (ops/graph.adamic_adar) over
        the high-quantity (l_quantity >= 45) customer-supplier
        purchase graph: for each node pair sharing a neighbor, the sum
        of floor(1e9 / ln(deg(z))) over common neighbors z as exact
        int64 — fixed-point so the distributed sum is layout-invariant
        and the oracle replays the driver-generated per-degree weight
        table via VALUES (no SQL/numpy libm divergence possible).
        Centers above deg 64 are dropped on BOTH sides (the documented
        hot-key cap, same hazard as pair blocking)."""
        from aml_entity_resolution_assignment_ray.ops.graph import (
            adamic_adar,
        )

        _tune_context()
        cfg = EngineConfig()
        nparts = cfg.resolve_join_partitions()

        orders = _read(sf_dir, "orders").select_columns(
            ["o_orderkey", "o_custkey"]).map_batches(
            lambda d: pd.DataFrame({
                "orderkey": d["o_orderkey"].astype(np.int64),
                "custkey": d["o_custkey"].astype(np.int64)}),
            batch_format="pandas")
        li = _read(sf_dir, "lineitem").select_columns(
            ["l_orderkey", "l_suppkey", "l_quantity"]).map_batches(
            lambda d: pd.DataFrame({
                "orderkey": d["l_orderkey"][
                    d["l_quantity"] >= 45].astype(np.int64),
                "suppkey": d["l_suppkey"][
                    d["l_quantity"] >= 45].astype(np.int64)}),
            batch_format="pandas")
        ol = safe_join(li, orders, join_type="inner",
                       num_partitions=nparts, on=("orderkey",))
        edges = ol.map_batches(
            lambda d: pd.DataFrame({
                "a": "c" + d["custkey"].astype(np.int64).astype(str),
                "b": "s" + d["suppkey"].astype(np.int64).astype(str)}),
            batch_format="pandas")
        return adamic_adar(edges, max_degree=64, cfg=cfg)

    def part_copurchase_triangles(sf_dir):
        """Per-part triangle counts of the co-purchase graph (parts
        appearing in the same order) — ops/graph.triangle_counts: the
        degree-ordered wedge algorithm, wedge volume bounded m^1.5
        under hub skew, exact integer counts replayed by a three-way
        SQL self-join."""
        from aml_entity_resolution_assignment_ray.ops.graph import (
            triangle_counts,
        )

        _tune_context()
        cfg = EngineConfig()
        nparts = cfg.resolve_join_partitions()

        li = _read(sf_dir, "lineitem").select_columns(
            ["l_orderkey", "l_partkey"])
        l1 = li.map_batches(
            lambda d: pd.DataFrame({
                "orderkey": d["l_orderkey"].astype(np.int64),
                "pa": d["l_partkey"].astype(np.int64)}),
            batch_format="pandas")
        l2 = li.map_batches(
            lambda d: pd.DataFrame({
                "orderkey": d["l_orderkey"].astype(np.int64),
                "pb": d["l_partkey"].astype(np.int64)}),
            batch_format="pandas")
        j = safe_join(l1, l2, join_type="inner",
                      num_partitions=nparts, on=("orderkey",))
        edges = j.map_batches(
            lambda d: d[d["pa"] < d["pb"]][["pa", "pb"]],
            batch_format="pandas")
        return triangle_counts(edges, a="pa", b="pb", cfg=cfg)

    def _ahash_pairs_corpus() -> pd.DataFrame:
        """Decoded image corpus with planted exact and lightly-noised
        copies, persisted for the SQL oracles (deterministic: seeded
        media + seeded noise)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from aml_entity_resolution_assignment_ray.ops import multimodal as mm

        media = rd.from_arrow(mm.make_fake_media_table(n=48))
        images = media.filter(expr="mime == 'image/png'")
        dec_df = mm.decode_images(images, fake=True).to_pandas() \
            .sort_values("media_id").reset_index(drop=True)

        # plant copies: every 3rd image an exact dup (hamming 0), the
        # next a lightly-noised dup (small hamming), the rest unpaired
        rng = np.random.default_rng(23)
        copies = []
        for i in range(len(dec_df)):
            row = dec_df.iloc[i]
            px = np.asarray(row["pixels"], dtype=np.int64).copy()
            if i % 3 == 1:
                idx = rng.integers(0, len(px), size=max(1, len(px) // 64))
                px[idx] = np.clip(
                    px[idx] + rng.integers(-12, 13, size=len(idx)), 0, 255)
            elif i % 3 == 2:
                continue
            copies.append({
                "media_id": "dup_" + str(row["media_id"]),
                "pixels": px.astype(np.uint8),
                "shape": row["shape"],
            })
        all_df = pd.concat([dec_df, pd.DataFrame(copies)],
                           ignore_index=True)

        os.makedirs("/tmp/er_media", exist_ok=True)
        pq.write_table(pa.table({
            "media_id": pa.array([str(m) for m in all_df["media_id"]],
                                 pa.string()),
            "pixels": pa.array(
                [np.asarray(p, dtype=np.int32).tolist()
                 for p in all_df["pixels"]], pa.list_(pa.int32())),
            "shape": pa.array(
                [list(map(int, s)) for s in all_df["shape"]],
                pa.list_(pa.int64())),
        }), "/tmp/er_media/ahash_pairs_decoded.parquet")
        return all_df

    def image_ahash_dups(sf_dir):
        """Near-duplicate IMAGE pairs at average-hash hamming <= 6 over
        a decoded corpus with planted exact and slightly-perturbed
        copies (ops/multimodal.image_ahash_dup_pairs -> the shared
        ops/dedup.hash64_dup_pairs banding+verify).  The SQL recomputes
        every ahash bit from the persisted decode and all-pairs-joins
        at this tiny scale; the engine's banded path must surface
        exactly the same pairs with the same exact distances."""
        _tune_context()
        import ray.data as rd

        from aml_entity_resolution_assignment_ray.ops import multimodal as mm

        all_df = _ahash_pairs_corpus()
        return mm.image_ahash_dup_pairs(rd.from_pandas(all_df),
                                        max_hamming=6)

    def image_dup_clusters(sf_dir):
        """Image duplicate CLUSTERS: connected components over the
        ahash near-dup pairs (stages/cluster.connected_components, the
        same distributed union-find as the flagship's entity
        resolution), every image labeled with its component's min
        media_id — the media -> signature -> banded pairs -> transitive
        clustering composition.  Oracled by WITH RECURSIVE reachability
        over the SQL-recomputed pair set."""
        _tune_context()
        import ray.data as rd

        from aml_entity_resolution_assignment_ray.ops import multimodal as mm
        from aml_entity_resolution_assignment_ray.stages.cluster import (
            connected_components,
        )

        all_df = _ahash_pairs_corpus()
        pairs = mm.image_ahash_dup_pairs(
            rd.from_pandas(all_df), max_hamming=6) \
            .map_batches(lambda d: d[["id_a", "id_b"]],
                         batch_format="pandas")
        nodes = rd.from_pandas(pd.DataFrame(
            {"conv_id": all_df["media_id"].astype(str)}))
        labels = connected_components(pairs, nodes)
        return labels.map_batches(
            lambda d: pd.DataFrame({"media_id": d["node"],
                                    "canonical_id": d["label"]}),
            batch_format="pandas")

    def user_value_ewma(sf_dir):
        """Per-user fixed-point EWMA of event value cents
        (ops/relational.grouped_ewma): the trend-smoothing window in
        exact integer arithmetic, bit-replayed by a recursive CTE
        stepping each user's event sequence."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            grouped_ewma,
        )

        _tune_context()
        ds = _read(sf_dir, "events").select_columns(
            ["event_id", "user_id", "ts", "value"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_id": df["event_id"].astype(np.int64),
                "user_id": df["user_id"],
                "ts_us": df["ts"].to_numpy(dtype="datetime64[us]")
                .astype(np.int64),
                "cents": _round_half_away(
                    df["value"].to_numpy(dtype=np.float64) * 100)
                .astype(np.int64),
            })

        r = grouped_ewma(ds.map_batches(prep, batch_format="pandas"),
                         key="user_id", order_cols=["ts_us", "event_id"],
                         val_col="cents", out_col="ewma_cents")
        return r.map_batches(
            lambda d: d[["event_id", "ewma_cents"]],
            batch_format="pandas")

    def event_cube(sf_dir):
        """GROUP BY CUBE over (event_type, hour-of-day): every subset
        grouping from one pass over the raw rows
        (ops/relational.cube_sum — finest level aggregates once, the
        2^k subsets cascade from it as combiners)."""
        from aml_entity_resolution_assignment_ray.ops.relational import (
            cube_sum,
        )

        _tune_context()
        ds = _read(sf_dir, "events").select_columns(
            ["event_type", "ts", "value"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_type": df["event_type"],
                "hr": df["ts"].dt.hour.astype(str),
                "cents": _round_half_away(
                    df["value"].to_numpy(dtype=np.float64) * 100)
                .astype(np.int64),
            })

        return cube_sum(ds.map_batches(prep, batch_format="pandas"),
                        keys=["event_type", "hr"], val_cols=["cents"])

    def event_type_hour_mi(sf_dir):
        """Mutual information between event type and hour of day
        (ops/profile.categorical_mi): exact integer contingency counts
        through one keyed_sum, closed form over the |A|x|B| cell table,
        sorted-order float sum rounded to 6 — the grouped_entropy
        replay pattern."""
        from aml_entity_resolution_assignment_ray.ops.profile import (
            categorical_mi,
        )

        _tune_context()
        ds = _read(sf_dir, "events").select_columns(["event_type", "ts"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_type": df["event_type"],
                "hr": df["ts"].dt.hour.astype(str),
            })

        return categorical_mi(ds.map_batches(prep, batch_format="pandas"),
                              col_a="event_type", col_b="hr")

    def doc_contrastive_negatives(sf_dir):
        """Deterministic negative-pair mining for contrastive training
        (ops/sample.contrastive_negatives): k=2 arithmetic partners per
        anchor via the Knuth hash, self-pairs shifted away, accidental
        positives (equal text) dropped through one digest hash-join."""
        from aml_entity_resolution_assignment_ray.ops.sample import (
            contrastive_negatives,
        )

        _tune_context()
        ds = _read(sf_dir, "documents", spread=True).select_columns(
            ["doc_id", "text"])
        n = _table_rows(sf_dir, "documents")
        return contrastive_negatives(ds, id_col="doc_id",
                                     text_col="text", k=2, n_rows=n)

    # The flagship ER / dedup / ANN / media family leads the dict: the
    # driver sweeps a prefix subset when the registry is large, and these
    # are the queries that evidence the north-star pipeline.
    return {
        "er_profiles": er_profiles,
        "er_pairs": er_pairs,
        "er_turn_collapse": er_turn_collapse,
        "er_dialogue_stats": er_dialogue_stats,
        "er_sft_pairs": er_sft_pairs,
        "er_conv_dedup": er_conv_dedup,
        "er_response_latency": er_response_latency,
        "er_email_consistency": er_email_consistency,
        "er_turn_context": er_turn_context,
        "er_pairs_exact_keys": er_pairs_exact_keys,
        "er_classified": er_classified,
        "er_score_calibration": er_score_calibration,
        "er_name_cosine": er_name_cosine,
        "er_clusters": er_clusters,
        "er_eval_metrics": er_eval_metrics,
        "minhash_dup_pairs_docs": minhash_dup_pairs_docs,
        "simhash_dup_pairs_docs": simhash_dup_pairs_docs,
        "minhash_dedup_docs": minhash_dedup_docs,
        "minhash_dedup_incremental": minhash_dedup_incremental,
        "ngram_jaccard_docs": ngram_jaccard_docs,
        "doc_cosine_pairs": doc_cosine_pairs,
        "doc_greedy_cover": doc_greedy_cover,
        "ann_top10": ann_top10,
        "ann_ivf_top10": ann_ivf_top10,
        "ann_ivf_appended": ann_ivf_appended,
        "ann_rrf_top10": ann_rrf_top10,
        "embedding_dup_pairs": embedding_dup_pairs_q,
        "embedding_dup_pairs_lsh": embedding_dup_pairs_lsh,
        "semdedup_pairs": semdedup_pairs_q,
        "semdedup_keep": semdedup_keep_q,
        "semdedup_clusters": semdedup_clusters_q,
        "embedding_quantized": embedding_quantized,
        "embedding_gram": embedding_gram,
        "embedding_projection": embedding_projection,
        "embedding_pca2": embedding_pca2,
        "embedding_kmeans_cells": embedding_kmeans_cells,
        "embedding_norms": embedding_norms,
        "label_centroids": label_centroids,
        "media_features": media_features,
        "image_ahash": image_ahash,
        "audio_features": audio_features,
        "audio_frames": audio_frames,
        "media_meta": media_meta,
        "video_frames": video_frames,
        "video_motion": video_motion,
        "video_mp4_samples": video_mp4_samples,
        "lineitem_agg": lineitem_agg,
        "segment_revenue": segment_revenue,
        "nation_acctbal": nation_acctbal,
        "top_orders": top_orders,
        "cust_order_totals": cust_order_totals,
        "cust_no_orders": cust_no_orders,
        "cust_with_orders": cust_with_orders,
        "fk_orphans": fk_orphans,
        "incremental_event_counts": incremental_event_counts,
        "user_value_intervals": user_value_intervals,
        "cust_running_revenue": cust_running_revenue,
        "nation_revenue_q5": nation_revenue_q5,
        "high_value_click_events": high_value_click_events,
        "event_type_stats": event_type_stats,
        "events_jsonl_stats": events_jsonl_stats,
        "events_jsonl_parsed": events_jsonl_parsed,
        "events_partitioned_stats": events_partitioned_stats,
        "events_range_partition_stats": events_range_partition_stats,
        "events_schema_evolution": events_schema_evolution,
        "event_zscores": event_zscores,
        "customer_csv_stats": customer_csv_stats,
        "hourly_user_events": hourly_user_events,
        "event_rollup": event_rollup,
        "user_event_pivot": user_event_pivot,
        "distinct_event_types": distinct_event_types,
        "events_profile_numeric": events_profile_numeric,
        "events_profile_strings": events_profile_strings,
        "event_value_histogram": event_value_histogram,
        "event_value_equidepth": event_value_equidepth,
        "late_events": late_events,
        "global_revenue_running": global_revenue_running,
        "user_funnel": user_funnel,
        "new_users_per_hour": new_users_per_hour,
        "user_retention": user_retention,
        "user_value_window_sum": user_value_window_sum,
        "event_type_jaccard": event_type_jaccard,
        "event_value_winsorized": event_value_winsorized,
        "hourly_top_types": hourly_top_types,
        "event_value_outliers": event_value_outliers,
        "hourly_distinct_users": hourly_distinct_users,
        "user_event_entropy": user_event_entropy,
        "user_top_event_type": user_top_event_type,
        "exact_dedup_docs": exact_dedup_docs,
        "doc_dedup_keep_best": doc_dedup_keep_best,
        "corpus_diff": corpus_diff,
        "customer_cdc_merged": customer_cdc_merged,
        "exact_dedup_incremental": exact_dedup_incremental,
        "doc_token_counts": doc_token_counts,
        "doc_repetition": doc_repetition,
        "doc_line_dedup": doc_line_dedup,
        "doc_quality": doc_quality,
        "doc_clean": doc_clean,
        "doc_lang_id": doc_lang_id,
        "doc_fingerprints": doc_fingerprints,
        "doc_pii_scrub": doc_pii_scrub,
        "doc_top_terms": doc_top_terms,
        "doc_tfidf_top5": doc_tfidf_top5,
        "doc_hash_split": doc_hash_split,
        "source_char_budget_sample": source_char_budget_sample,
        "doc_lm_score": doc_lm_score,
        "doc_collocations": doc_collocations,
        "doc_shuffle_index": doc_shuffle_index,
        "doc_weighted_sample": doc_weighted_sample,
        "source_mixture": source_mixture,
        "doc_chunks": doc_chunks,
        "bpe_learned_merges": bpe_learned_merges,
        "bpe_token_histogram": bpe_token_histogram,
        "doc_token_ids": doc_token_ids,
        "mixture_resampled": mixture_resampled,
        "doc_stratified_sample": doc_stratified_sample,
        "doc_pack": doc_pack,
        "doc_pack_texts": doc_pack_texts,
        "doc_contamination": doc_contamination,
        "doc_contamination_bloom": doc_contamination_bloom,
        "corpus_prep": corpus_prep_q,
        "doc_dup_grams": doc_dup_grams,
        "doc_substring_dedup": doc_substring_dedup,
        "event_sessions": event_sessions,
        "session_type_lift": session_type_lift,
        "user_busy_intervals": user_busy_intervals,
        "event_type_drift": event_type_drift,
        "sliding_event_counts": sliding_event_counts,
        "sliding_user_counts": sliding_user_counts,
        "event_type_share": event_type_share,
        "event_value_ks": event_value_ks,
        "event_type_gini": event_type_gini,
        "purchase_value_ecdf": purchase_value_ecdf,
        "orders_asof": orders_asof,
        "lineitem_ship_window": lineitem_ship_window,
        "cust_top_orders": cust_top_orders,
        "price_quantiles": price_quantiles,
        "price_quantiles_cont": price_quantiles_cont,
        "cust_pareto": cust_pareto,
        "hourly_value_ohlc": hourly_value_ohlc,
        "event_hour_value_corr": event_hour_value_corr,
        "events_above_median": events_above_median,
        "event_type_approx_users": event_type_approx_users,
        "event_type_hll_users": event_type_hll_users,
        "event_type_cm_counts": event_type_cm_counts,
        "hourly_approx_users": hourly_approx_users,
        "event_value_quantiles_sketch": event_value_quantiles_sketch,
        "event_value_pct_rank": event_value_pct_rank,
        "event_value_dense_rank": event_value_dense_rank,
        "event_global_rank": event_global_rank,
        "user_first_last_event": user_first_last_event,
        "purchase_click_window": purchase_click_window,
        "event_value_imputed": event_value_imputed,
        "event_feature_hash": event_feature_hash,
        "event_gaps": event_gaps,
        "user_event_transitions": user_event_transitions,
        "event_value_ntile": event_value_ntile,
        "gram_overlap_est": gram_overlap_est,
        "event_hour_value_ols": event_hour_value_ols,
        "supplier_pagerank": supplier_pagerank,
        "cust_supp_communities": cust_supp_communities,
        "supplier_bfs_hops": supplier_bfs_hops,
        "supplier_adamic_adar": supplier_adamic_adar,
        "cust_supp_kcore": cust_supp_kcore,
        "part_copurchase_triangles": part_copurchase_triangles,
        "image_ahash_dups": image_ahash_dups,
        "image_dup_clusters": image_dup_clusters,
        "user_value_ewma": user_value_ewma,
        "event_cube": event_cube,
        "event_type_hour_mi": event_type_hour_mi,
        "doc_contrastive_negatives": doc_contrastive_negatives,
    }


def _poly_hash_sql(col: str) -> str:
    """DuckDB replay of ops/sample._hash_strs (the whole-string
    polynomial, 32-bit): left fold over codepoints — list_reduce's
    first-element seed equals the Python loop's first step
    ((0 * P + c0) & M32 == c0)."""
    return (f"CASE WHEN length({col}) = 0 THEN 0 ELSE "
            f"list_reduce(list_transform(generate_series(1, "
            f"length({col})), i -> CAST(unicode({col}[i]) AS BIGINT)), "
            f"(a, b) -> (a * 1000003 + b) % 4294967296) END")


def _bitlen_sql(expr: str, max_bits: int) -> str:
    """DuckDB replay of an exact integer bit length (0 for 0) for
    values known < 2^max_bits — a comparison CASE chain, no floating
    log2 anywhere (mirrors ops/sketch._hll_rank's frexp exponent)."""
    arms = " ".join(f"WHEN {expr} >= {1 << (b - 1)} THEN {b}"
                    for b in range(max_bits, 0, -1))
    return f"CASE {arms} ELSE 0 END"


def _dbl_sql(x: float) -> str:
    """A double literal DuckDB types as DOUBLE (plain decimal literals
    parse as DECIMAL, whose arithmetic would diverge from numpy)."""
    r = repr(float(x))
    return r if ("e" in r or "E" in r or "inf" in r) else r + "e0"


def _hll_const() -> float:
    """The folded double constant alpha_m * m^2 * 2^R of the p=6 HLL
    estimator, computed with the SAME expression order as
    ops/sketch._hll_estimate so the embedded SQL literal is the
    identical IEEE double."""
    from aml_entity_resolution_assignment_ray.ops.sketch import _HLL_ALPHA_64

    m, field_bits = 64, 26
    return _HLL_ALPHA_64 * float(m) * float(m) * float(2 ** (field_bits + 1))


def _lang_vote_sql_parts() -> tuple[list, list]:
    """(per-language vote columns, CASE arms) for the stopword-voting
    LID, built from the SAME stopword lists and token semantics as
    ops/text.py (tokens = maximal [A-Za-zÀ-ÿ]+ runs; winner must
    strictly beat every other language and score > 0).  Shared by the
    doc_lang_id and corpus_prep oracles."""
    import re as _re

    from aml_entity_resolution_assignment_ray.ops.text import _STOPWORDS, _WORD_RE

    langs = sorted(_STOPWORDS)
    cols = []
    for lang in langs:
        ok = sorted(w for w in _STOPWORDS[lang] if _re.fullmatch(_WORD_RE, w))
        lst = ", ".join(f"'{w}'" for w in ok)
        cols.append(
            f"len(list_filter(regexp_extract_all(lower(coalesce(text, '')), "
            f"'[a-zA-ZÀ-ÿ]+'), t -> list_contains([{lst}], t))) AS v_{lang}")
    cases = []
    for lang in langs:
        others = " AND ".join(
            f"v_{lang} > v_{o}" for o in langs if o != lang)
        cases.append(f"WHEN v_{lang} > 0 AND {others} THEN '{lang}'")
    return cols, cases


def _lang_id_sql() -> str:
    cols, cases = _lang_vote_sql_parts()
    return f"""
        WITH v AS (SELECT doc_id, {', '.join(cols)} FROM documents)
        SELECT doc_id, CASE {' '.join(cases)} ELSE 'und' END AS lang_pred
        FROM v
    """


def _corpus_prep_sql(quality_min: float = 0.35, lang: str = "en",
                     gram_n: int = 4) -> str:
    """The full corpus_prep pipeline replayed in SQL: exact dedup (min
    doc_id per text) -> quality_score (the exact float64 expression of
    ops/text.quality_batch, same operation order) + stopword-voting LID
    -> filter -> 4-gram decontamination vs the doc_id%20 benchmark ->
    whitespace token counts on survivors."""
    import re as _re

    from aml_entity_resolution_assignment_ray.ops.text import (
        _STOPWORDS,
        _WORD_RE,
        ws_normalize_sql,
    )

    cols, cases = _lang_vote_sql_parts()
    union = sorted(w for w in frozenset().union(*_STOPWORDS.values())
                   if _re.fullmatch(_WORD_RE, w))
    union_lst = ", ".join(f"'{w}'" for w in union)
    g1, g2 = gram_n - 1, gram_n
    ws = ws_normalize_sql("text")
    return f"""
        WITH dedup AS (
          SELECT text, min(doc_id) AS doc_id FROM documents
          WHERE doc_id % 20 <> 0 GROUP BY text
        ),
        q AS (
          SELECT doc_id, text,
                 length(text) AS n,
                 length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS n_punct,
                 length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
                 len(regexp_extract_all(lower(coalesce(text, '')),
                     '[a-zA-ZÀ-ÿ]+')) AS n_words,
                 len(list_filter(regexp_extract_all(lower(coalesce(text, '')),
                     '[a-zA-ZÀ-ÿ]+'),
                     t -> list_contains([{union_lst}], t))) AS n_stop,
                 {', '.join(cols)}
          FROM dedup
        ),
        scored AS (
          SELECT doc_id, text,
                 CASE WHEN n = 0 THEN 0.0 ELSE
                   least(greatest(CAST(n AS DOUBLE) / 200.0, 0.0), 1.0) * 0.3
                   + least(greatest(1.0 - (CAST(n_punct AS DOUBLE)
                       / greatest(n, 1)) * 4, 0.0), 1.0) * 0.2
                   + least(greatest(1.0 - (CAST(n_digit AS DOUBLE)
                       / greatest(n, 1)) * 4, 0.0), 1.0) * 0.2
                   + least(greatest((CAST(n_stop AS DOUBLE)
                       / greatest(n_words, 1)) * 3, 0.0), 1.0) * 0.3
                 END AS quality_score,
                 CASE {' '.join(cases)} ELSE 'und' END AS lang_pred
          FROM q
        ),
        kept AS (
          SELECT doc_id, text, quality_score FROM scored
          WHERE quality_score >= {quality_min} AND lang_pred = '{lang}'
        ),
        kgrams AS (
          SELECT DISTINCT doc_id,
                 array_to_string(list_slice(toks, i, i + {g1}), ' ') AS gram
          FROM (
            SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - {g1})) AS i
            FROM (SELECT doc_id,
                         string_split(lower(trim(regexp_replace({ws},
                             '\\s+', ' ', 'g'))), ' ') AS toks
                  FROM kept)
            WHERE len(toks) >= {g2})
        ),
        bgrams AS (
          SELECT DISTINCT
                 array_to_string(list_slice(toks, i, i + {g1}), ' ') AS gram
          FROM (
            SELECT toks, unnest(generate_series(1, len(toks) - {g1})) AS i
            FROM (SELECT string_split(lower(trim(regexp_replace({ws},
                             '\\s+', ' ', 'g'))), ' ') AS toks
                  FROM documents WHERE doc_id % 20 = 0)
            WHERE len(toks) >= {g2})
        ),
        dirty AS (
          SELECT DISTINCT doc_id FROM kgrams JOIN bgrams USING (gram)
        )
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_text,
               CAST(CASE WHEN length(txt) = 0 THEN 0
                    ELSE array_length(regexp_split_to_array(txt, '\\s+'))
               END AS BIGINT) AS n_tokens,
               round(quality_score, 6) AS quality_score
        FROM (SELECT *, trim({ws},
                   ' ' || chr(9) || chr(10) || chr(12) || chr(13)) AS txt
              FROM kept)
        WHERE doc_id NOT IN (SELECT doc_id FROM dirty)
    """


def _er_profiles_cte() -> str:
    """CTE chain ``turns, agg, split, profiles`` over the oracle corpus
    parquet: per-turn regex extraction (stages/extract.py semantics),
    first non-null in turn order, then the reference normalizers
    (preprocessing.py:18-130, 178-187) expressed in SQL — ALL norm
    columns including address (18 abbreviation expansions) and dob_year,
    so the downstream feature/cascade oracles can hydrate from it."""
    fold = ("strip_accents(replace(replace(replace(replace({x}, "
            "'ł', 'l'), 'Ł', 'L'), 'ß', 'ss'), 'ẞ', 'SS'))")
    # textnorm._ADDR_REPLACEMENTS, same order (replacements never chain)
    abbrevs = [("st", "street"), ("ave", "avenue"), ("rd", "road"),
               ("blvd", "boulevard"), ("dr", "drive"), ("ln", "lane"),
               ("apt", "apartment"), ("ste", "suite"), ("ul", "ulica"),
               ("al", "aleja"), ("os", "osiedle"), ("m", "mieszkanie"),
               ("c", "calle"), ("av", "avenida"), ("pza", "plaza"),
               ("pso", "paseo"), ("str", "strasse"), ("pl", "platz")]
    addr_expr = ("regexp_replace(trim(lower("
                 + fold.format(x="coalesce(address, '')")
                 + ")), '[^\\w\\s]', '', 'g')")
    for pat, rep in abbrevs:
        addr_expr = f"regexp_replace({addr_expr}, '\\b{pat}\\b', '{rep}', 'g')"
    return f"""
        turns AS (
          SELECT conv_id, turn_idx,
                 nullif(regexp_extract(text, 'i am (.+?) and i need help', 1), '') AS name,
                 nullif(trim(regexp_extract(text, 'dob: ([^;]+)', 1)), '') AS dob,
                 nullif(trim(regexp_extract(text, 'email: ([^;]+)', 1)), '') AS email,
                 nullif(trim(regexp_extract(text, 'phone: ([^;]+)', 1)), '') AS phone,
                 nullif(trim(regexp_extract(text, 'national_id=([^;]+)', 1)), '') AS nid,
                 nullif(regexp_extract(text, 'my address is (.+), (.+)$', 1), '') AS address
          FROM read_parquet('{_oracle_corpus_path(_oracle_n())}')
        ),
        agg AS (
          SELECT conv_id,
                 count(*) AS n_turns,
                 min_by(name,  CASE WHEN name  IS NOT NULL THEN turn_idx END) AS name,
                 min_by(dob,   CASE WHEN dob   IS NOT NULL THEN turn_idx END) AS dob,
                 min_by(email, CASE WHEN email IS NOT NULL THEN turn_idx END) AS email,
                 min_by(phone, CASE WHEN phone IS NOT NULL THEN turn_idx END) AS nphone,
                 min_by(nid,   CASE WHEN nid   IS NOT NULL THEN turn_idx END) AS nid,
                 min_by(address, CASE WHEN address IS NOT NULL THEN turn_idx END) AS address
          FROM turns GROUP BY conv_id
        ),
        split AS (
          SELECT *, regexp_extract(coalesce(name, ''), '^(\\S+)', 1) AS first_name,
                 nullif(regexp_extract(coalesce(name, ''), '^\\S+ (.+)$', 1), '') AS last_name,
                 trim(lower(coalesce(email, ''))) AS e,
                 ltrim(regexp_replace(coalesce(nphone, ''), '[^0-9]', '', 'g'), '0') AS pd,
                 coalesce(
                   try_strptime(dob, '%Y-%m-%d'),
                   try_strptime(dob, '%d/%m/%Y'),
                   try_strptime(dob, '%m-%d-%Y'),
                   try_strptime(dob, '%Y/%m/%d')) AS dparsed
          FROM agg
        ),
        profiles AS (
          SELECT conv_id, n_turns,
               trim(lower({fold.format(x="coalesce(first_name, '')")})) AS norm_first_name,
               trim(lower({fold.format(x="coalesce(last_name, '')")})) AS norm_last_name,
               CASE WHEN instr(e, '@') > 0
                    THEN replace(substr(e, 1, instr(e, '@') - 1), '.', '')
                         || '@' || substr(e, instr(e, '@') + 1)
                    ELSE e END AS norm_email,
               CASE WHEN length(pd) = 11 AND (pd LIKE '48%' OR pd LIKE '34%')
                         THEN substr(pd, 3)
                    WHEN length(pd) = 11 AND pd LIKE '1%' THEN substr(pd, 2)
                    WHEN length(pd) >= 12 AND pd LIKE '49%' THEN substr(pd, 3)
                    ELSE pd END AS norm_phone,
               upper(regexp_replace(coalesce(nid, ''), '[^a-zA-Z0-9]', '', 'g')) AS norm_nid,
               strftime(dparsed, '%Y-%m-%d') AS norm_dob,
               coalesce(strftime(dparsed, '%Y'), '0000') AS norm_dob_year,
               {addr_expr} AS norm_address
          FROM split
        )
    """


def _er_profiles_sql() -> str:
    """The er_profiles query surface: the full-profile CTE projected to
    the columns the Ray-side er_profiles query emits."""
    return f"""
        WITH {_er_profiles_cte()}
        SELECT conv_id, n_turns, norm_first_name, norm_last_name,
               norm_email, norm_phone, norm_nid, norm_dob
        FROM profiles
    """


def _er_pairs_exact_sql() -> str:
    """Candidate pairs over the four EXACT blocking keys (B2-B5), as a
    SQL self-join on the oracled profiles — value-checks the pair engine
    (hash repartition + vectorized emission + exact distinct) end to end.
    The minhash band key (B1) is signature-defined and stays out."""
    return f"""
        WITH profiles AS ({_er_profiles_sql()}),
        keys AS (
          SELECT 'nid' AS kt, norm_nid AS kv, conv_id FROM profiles
          WHERE length(norm_nid) > 4
          UNION ALL
          SELECT 'phone', right(norm_phone, 6), conv_id FROM profiles
          WHERE length(norm_phone) >= 6
          UNION ALL
          SELECT 'email', norm_email, conv_id FROM profiles
          WHERE length(norm_email) > 0
          UNION ALL
          SELECT 'initial_dob',
                 substr(norm_first_name, 1, 1) || '|' || norm_last_name
                     || '|' || norm_dob,
                 conv_id
          FROM profiles
          WHERE length(norm_first_name) > 0 AND length(norm_last_name) > 0
                AND norm_dob IS NOT NULL AND length(norm_dob) > 0
        )
        SELECT DISTINCT a.conv_id AS id_a, b.conv_id AS id_b
        FROM keys a JOIN keys b
          ON a.kt = b.kt AND a.kv = b.kv AND a.conv_id < b.conv_id
    """


def _er_pairs_chain_cte(cap: int | None = None) -> str:
    """CTE chain (assumes ``profiles`` is in scope) for the FULL
    candidate-pair engine in SQL, ending in ``cand(id_a, id_b)``: exact
    keys (B2-B5) UNION MinHash band keys (B1) over the profile full
    name, with the same per-block size cap as
    stages/pairs.generate_pairs.  Band-key equality is expressed as
    equality of the r raw signature values per band (identical candidate
    semantics to the Ray side's uint64 band hash modulo 2^-64
    collisions); the name MinHash reproduces functions/minhash.py
    bit-exactly, including the whole-string-hash branch for names
    shorter than 3 chars."""
    from aml_entity_resolution_assignment_ray.config import DEFAULT_CONFIG
    from aml_entity_resolution_assignment_ray.functions import minhash as mh

    if cap is None:
        # the flagship's effective purge cap: hard_block_cap with the
        # default salt-instead-of-purge, max_block_records with salting
        # off — the SQL replay must drop exactly the groups Ray drops
        cap = DEFAULT_CONFIG.pair_emission_cap(DEFAULT_CONFIG.salt_pairs)
    threshold = DEFAULT_CONFIG.lsh_threshold
    num_perm = DEFAULT_CONFIG.lsh_num_perm
    bands, rows = mh.optimal_param(threshold, num_perm)
    a, b = mh.permutations(num_perm)
    perm_vals = ",".join(
        f"({i},{int(a[i])},{int(b[i])})" for i in range(num_perm))
    return f"""
        ekeys AS (
          SELECT 'nid' AS kt, norm_nid AS kv, conv_id FROM profiles
          WHERE length(norm_nid) > 4
          UNION ALL
          SELECT 'phone', right(norm_phone, 6), conv_id FROM profiles
          WHERE length(norm_phone) >= 6
          UNION ALL
          SELECT 'email', norm_email, conv_id FROM profiles
          WHERE length(norm_email) > 0
          UNION ALL
          SELECT 'initial_dob',
                 substr(norm_first_name, 1, 1) || '|' || norm_last_name
                     || '|' || norm_dob,
                 conv_id
          FROM profiles
          WHERE length(norm_first_name) > 0 AND length(norm_last_name) > 0
                AND norm_dob IS NOT NULL AND length(norm_dob) > 0
        ),
        names AS (
          SELECT conv_id,
                 trim(norm_first_name || ' ' || norm_last_name) AS s
          FROM profiles
          WHERE length(trim(norm_first_name || ' ' || norm_last_name)) > 0
        ),
        shingles AS (
          SELECT DISTINCT conv_id,
                 (unicode(substr(s, i, 1)) * 1000006000009
                  + unicode(substr(s, i+1, 1)) * 1000003
                  + unicode(substr(s, i+2, 1))) % 4294967296 AS x
          FROM (SELECT conv_id, s,
                       unnest(generate_series(1, length(s) - 2)) AS i
                FROM names WHERE length(s) >= 3)
          UNION
          SELECT conv_id,
                 CASE WHEN length(s) = 1 THEN unicode(s) % 4294967296
                      ELSE (unicode(substr(s, 1, 1)) * 1000003
                            + unicode(substr(s, 2, 1))) % 4294967296 END
          FROM names WHERE length(s) < 3
        ),
        perms(pid, pa, pb) AS (VALUES {perm_vals}),
        sig AS (
          SELECT conv_id, pid,
                 min(CAST(((CAST(pa AS HUGEINT) * x + pb)
                           % 2305843009213693951) % 4294967296 AS BIGINT)) AS v
          FROM shingles CROSS JOIN perms GROUP BY conv_id, pid
        ),
        bkeys AS (
          SELECT conv_id, 'minhash' AS kt,
                 CAST(pid // {rows} AS VARCHAR) || ':'
                     || string_agg(CAST(v AS VARCHAR), ',' ORDER BY pid) AS kv
          FROM sig WHERE pid < {bands * rows}
          GROUP BY conv_id, pid // {rows}
        ),
        keys AS (
          SELECT kt, kv, conv_id FROM ekeys
          UNION ALL
          SELECT kt, kv, conv_id FROM bkeys
        ),
        ok AS (
          SELECT kt, kv FROM keys GROUP BY kt, kv
          HAVING count(*) <= {cap}
        ),
        cand AS (
          SELECT DISTINCT a.conv_id AS id_a, b.conv_id AS id_b
          FROM keys a
          JOIN keys b ON a.kt = b.kt AND a.kv = b.kv AND a.conv_id < b.conv_id
          JOIN ok ON ok.kt = a.kt AND ok.kv = a.kv
        )
    """


def _er_pairs_sql() -> str:
    return f"""
        WITH {_er_profiles_cte()},
        {_er_pairs_chain_cte()}
        SELECT id_a, id_b FROM cand
    """


def _er_scored_chain_cte() -> str:
    """CTE chain (assumes ``profiles`` and ``cand`` in scope) ending in
    ``ruled(id_a, id_b, ml, is_m, is_rv, veto_c)``: pair hydration, the
    9 pairwise features via DuckDB's jellyfish-compatible string
    built-ins (verified equal to functions/strsim.py), the packaged
    GBDT compiled tree-by-tree into nested CASE expressions (same
    left-to-right double summation as functions/gbdt.decision_function),
    and the reference rule cascade (matching.py:408-531)."""
    import json as _json

    from aml_entity_resolution_assignment_ray.config import DEFAULT_CONFIG
    from aml_entity_resolution_assignment_ray.functions.model import FEATURE_COLS

    d = _json.load(open(DEFAULT_CONFIG.model_path))
    if d["type"] == "gbdt":
        lr = d["learning_rate"]
        exprs = []
        for t in d["trees"]:
            feat, thr = t["feature"], t["threshold"]
            val, leaf = t["value"], t["is_leaf"]

            def node(i):
                if leaf[i]:
                    return repr(val[i])
                return (f"(CASE WHEN {FEATURE_COLS[feat[i]]} < {thr[i]!r} "
                        f"THEN {node(2 * i + 1)} ELSE {node(2 * i + 2)} END)")
            exprs.append(node(0))
        z = repr(d["base_score"]) + "".join(f" + {lr!r} * {e}" for e in exprs)
    else:  # logistic fallback artifact
        terms = " + ".join(
            f"{w!r} * {c}" for w, c in zip(d["weights"], FEATURE_COLS))
        z = f"{d['bias']!r} + {terms}"
    return f"""
        feat AS (
          SELECT c.id_a, c.id_b,
            CASE WHEN length(a.norm_nid) > 0 AND length(b.norm_nid) > 0 THEN
              CASE WHEN damerau_levenshtein(a.norm_nid, b.norm_nid) = 0 THEN 1.0
                   ELSE 1.0 - CAST(damerau_levenshtein(a.norm_nid, b.norm_nid) AS DOUBLE)
                            / greatest(length(a.norm_nid), length(b.norm_nid)) END
              ELSE 0.0 END AS nid_score,
            CASE WHEN length(a.norm_email) > 0 AND length(b.norm_email) > 0
                 THEN jaro_winkler_similarity(a.norm_email, b.norm_email)
                 ELSE 0.0 END AS email_score,
            CASE WHEN length(a.norm_phone) > 0 AND length(b.norm_phone) > 0
                      AND a.norm_phone = b.norm_phone THEN 1 ELSE 0 END AS phone_match,
            CASE WHEN length(a.norm_first_name) > 0 AND length(b.norm_first_name) > 0
                 THEN jaro_winkler_similarity(a.norm_first_name, b.norm_first_name)
                 ELSE 0.0 END AS first_name_score,
            CASE WHEN length(a.norm_last_name) > 0 AND length(b.norm_last_name) > 0
                 THEN jaro_winkler_similarity(a.norm_last_name, b.norm_last_name)
                 ELSE 0.0 END AS last_name_score,
            CASE WHEN length(a.norm_address) > 0 AND length(b.norm_address) > 0
                 THEN 1.0 - CAST(levenshtein(a.norm_address, b.norm_address) AS DOUBLE)
                          / greatest(length(a.norm_address), length(b.norm_address))
                 ELSE 0.0 END AS addr_score,
            CASE WHEN coalesce(a.norm_dob, '') != '' AND coalesce(b.norm_dob, '') != ''
                      AND a.norm_dob = b.norm_dob THEN 1 ELSE 0 END AS dob_match,
            CASE WHEN a.norm_dob_year = b.norm_dob_year
                      AND a.norm_dob_year != '0000' THEN 1 ELSE 0 END AS year_match
          FROM cand c
          JOIN profiles a ON a.conv_id = c.id_a
          JOIN profiles b ON b.conv_id = c.id_b
        ),
        scored AS (
          SELECT *, 1.0 / (1.0 + exp(-greatest(least({z}, 35.0), -35.0))) AS ml,
                 (first_name_score + last_name_score) / 2.0 AS name_avg
          FROM feat
        ),
        ruled AS (
          SELECT id_a, id_b, ml,
            ((nid_score >= 0.90 AND name_avg > 0.85)
             OR ((email_score > 0.95 OR phone_match = 1) AND name_avg > 0.80
                 AND (dob_match = 1 OR nid_score > 0.5 OR year_match = 1))
             OR (name_avg > 0.85 AND dob_match = 1)
             OR (name_avg > 0.90 AND addr_score > 0.8)
             OR (ml > 0.8)
             OR (name_avg > 0.75 AND year_match = 1 AND nid_score > 0.8)) AS is_m,
            ((name_avg > 0.93 AND year_match = 1)
             OR (ml > 0.2) OR (nid_score >= 0.85) OR (name_avg > 0.9)
             OR (email_score = 1.0)) AS is_rv,
            (ml < 0.10 AND nid_score < 0.9 AND email_score < 0.9) AS veto_c
          FROM scored
        )
    """


def _er_classified_sql() -> str:
    """er_classified end to end in SQL: profiles -> candidate pairs ->
    features -> compiled GBDT -> rule cascade."""
    return f"""
        WITH {_er_profiles_cte()},
        {_er_pairs_chain_cte()},
        {_er_scored_chain_cte()}
        SELECT id_a, id_b,
               CASE WHEN is_m THEN 'match'
                    WHEN is_rv AND NOT veto_c THEN 'review'
                    ELSE 'no_match' END AS match_type,
               CASE WHEN is_m THEN 1 ELSE 0 END AS is_match
        FROM ruled
    """


def _er_cc_chain_cte() -> str:
    """CTE chain (assumes ``ruled`` in scope; query must open WITH
    RECURSIVE) ending in ``pred(conv_id, lab)``: match edges ->
    transitive closure -> min-conv_id component label, the same
    min-label semantics as stages/cluster.connected_components."""
    return """
        e AS (SELECT id_a AS u, id_b AS v FROM ruled WHERE is_m
              UNION ALL SELECT id_b, id_a FROM ruled WHERE is_m),
        reach(node, r) AS (
          SELECT conv_id, conv_id FROM profiles
          UNION
          SELECT e.v, reach.r FROM reach JOIN e ON e.u = reach.node
        ),
        pred AS (SELECT node AS conv_id, min(r) AS lab FROM reach GROUP BY node)
    """


def _er_clusters_sql() -> str:
    """er_clusters: classified match edges -> connected components ->
    ``ENT_`` + min-member-conv_id labels (stages/cluster.py:205-230)."""
    return f"""
        WITH RECURSIVE {_er_profiles_cte()},
        {_er_pairs_chain_cte()},
        {_er_scored_chain_cte()},
        {_er_cc_chain_cte()}
        SELECT conv_id, 'ENT_' || lab AS predicted_entity_id FROM pred
    """


def _er_name_cosine_sql(dim: int = 64) -> str:
    """er_name_cosine: the scorer's embedding-cosine feature
    (functions/embed.py) reproduced bit-exactly in DuckDB — the same
    3-char shingle polynomial hashes as the MinHash CTE, feature-hashed
    into ``dim`` signed buckets (sign = bit 0, bucket = (h >> 1) mod
    dim), cosine as dot / (sqrt(q_a) * sqrt(q_b)) over the exact
    integer-valued raw vectors (the Ray kernel evaluates the identical
    float64 expression, so rounding to 4 decimals is stable)."""
    ws = " \t\n\r\x0b\x0c"
    return f"""
        WITH {_er_profiles_cte()},
        {_er_pairs_chain_cte()},
        nm AS (
          SELECT conv_id AS id,
                 trim(coalesce(norm_first_name, '') || ' '
                      || coalesce(norm_last_name, ''), '{ws}') AS s
          FROM profiles
        ),
        nsh AS (
          SELECT id,
                 (unicode(substr(s, i, 1)) * 1000006000009
                  + unicode(substr(s, i + 1, 1)) * 1000003
                  + unicode(substr(s, i + 2, 1))) % 4294967296 AS x
          FROM (SELECT id, s, unnest(generate_series(1, length(s) - 2)) AS i
                FROM nm WHERE length(s) >= 3)
          UNION ALL
          SELECT id, CASE WHEN length(s) = 1 THEN unicode(s) % 4294967296
                          ELSE (unicode(substr(s, 1, 1)) * 1000003
                                + unicode(substr(s, 2, 1))) % 4294967296 END
          FROM nm WHERE length(s) BETWEEN 1 AND 2
        ),
        vec AS (
          SELECT id, CAST((x // 2) % {dim} AS INT) AS b,
                 sum(CASE WHEN x % 2 = 1 THEN 1 ELSE -1 END) AS v
          FROM nsh GROUP BY id, b
        ),
        vq AS (SELECT id, sum(v * v) AS q FROM vec GROUP BY id),
        dots AS (
          SELECT c.id_a, c.id_b, sum(va.v * vb.v) AS dot
          FROM cand c
          JOIN vec va ON va.id = c.id_a
          JOIN vec vb ON vb.id = c.id_b AND vb.b = va.b
          GROUP BY c.id_a, c.id_b
        )
        SELECT c.id_a, c.id_b,
               round(CASE WHEN qa.q > 0 AND qb.q > 0
                          THEN coalesce(d.dot, 0)
                               / (sqrt(CAST(qa.q AS DOUBLE))
                                  * sqrt(CAST(qb.q AS DOUBLE)))
                          ELSE 0.0 END, 4) AS name_cosine
        FROM cand c
        LEFT JOIN dots d ON d.id_a = c.id_a AND d.id_b = c.id_b
        LEFT JOIN vq qa ON qa.id = c.id_a
        LEFT JOIN vq qb ON qb.id = c.id_b
    """


def _er_calibration_sql() -> str:
    """er_score_calibration: compiled-GBDT ml replayed bit-for-bit,
    bucketed by floor(ml*10) (clamped to 9), truth-labeled, counted."""
    return f"""
        WITH {_er_profiles_cte()},
        {_er_pairs_chain_cte()},
        {_er_scored_chain_cte()},
        truth AS (SELECT conv_id, entity_id
                  FROM read_parquet('{_oracle_truth_path(_oracle_n())}')),
        lab AS (
          SELECT least(CAST(floor(c.ml * 10) AS BIGINT), 9) AS bucket,
                 CASE WHEN ta.entity_id = tb.entity_id
                      THEN 1 ELSE 0 END AS l
          FROM ruled c
          JOIN truth ta ON ta.conv_id = c.id_a
          JOIN truth tb ON tb.conv_id = c.id_b
        )
        SELECT bucket, count(*) AS n_pairs,
               CAST(sum(l) AS BIGINT) AS n_true,
               CAST(sum(l) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   AS match_rate
        FROM lab GROUP BY bucket
    """


def _er_eval_sql() -> str:
    """er_eval_metrics: pair-level P/R/F1 of the cascade's is_match
    against truth-labeled candidate pairs (stages/evaluate.py
    labeled_pair_eval) + cluster-level pairwise P/R/F1 of predicted vs
    true intra-cluster pair sets (pairwise_eval), one row."""
    return f"""
        WITH RECURSIVE {_er_profiles_cte()},
        {_er_pairs_chain_cte()},
        {_er_scored_chain_cte()},
        {_er_cc_chain_cte()},
        truth AS (SELECT conv_id, entity_id
                  FROM read_parquet('{_oracle_truth_path(_oracle_n())}')),
        labeled AS (
          SELECT CASE WHEN c.is_m THEN 1 ELSE 0 END AS is_match,
                 CASE WHEN ta.entity_id = tb.entity_id THEN 1 ELSE 0 END AS label
          FROM ruled c
          JOIN truth ta ON ta.conv_id = c.id_a
          JOIN truth tb ON tb.conv_id = c.id_b
        ),
        pcounts AS (
          SELECT sum(CASE WHEN label = 1 AND is_match = 1 THEN 1 ELSE 0 END) AS tp,
                 sum(CASE WHEN label = 0 AND is_match = 1 THEN 1 ELSE 0 END) AS fp,
                 sum(CASE WHEN label = 1 AND is_match = 0 THEN 1 ELSE 0 END) AS fn
          FROM labeled
        ),
        tpairs AS (
          SELECT a.conv_id AS id_a, b.conv_id AS id_b
          FROM truth a JOIN truth b
            ON a.entity_id = b.entity_id AND a.conv_id < b.conv_id
        ),
        ppairs AS (
          SELECT a.conv_id AS id_a, b.conv_id AS id_b
          FROM pred a JOIN pred b
            ON a.lab = b.lab AND a.conv_id < b.conv_id
        ),
        ccounts AS (
          SELECT (SELECT count(*) FROM ppairs JOIN tpairs USING (id_a, id_b)) AS tp,
                 (SELECT count(*) FROM ppairs) AS np,
                 (SELECT count(*) FROM tpairs) AS nt
        ),
        pm AS (
          SELECT CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 1.0 END AS p,
                 CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 1.0 END AS r
          FROM pcounts
        ),
        cm AS (
          SELECT CASE WHEN np > 0 THEN CAST(tp AS DOUBLE) / np ELSE 1.0 END AS p,
                 CASE WHEN nt > 0 THEN CAST(tp AS DOUBLE) / nt ELSE 1.0 END AS r
          FROM ccounts
        )
        SELECT round(pm.p, 6) AS pair_precision,
               round(pm.r, 6) AS pair_recall,
               round(CASE WHEN pm.p + pm.r > 0
                          THEN 2 * pm.p * pm.r / (pm.p + pm.r) ELSE 0.0 END, 6) AS pair_f1,
               round(cm.p, 6) AS cluster_precision,
               round(cm.r, 6) AS cluster_recall,
               round(CASE WHEN cm.p + cm.r > 0
                          THEN 2 * cm.p * cm.r / (cm.p + cm.r) ELSE 0.0 END, 6) AS cluster_f1
        FROM pm, cm
    """


def _minhash_cte(threshold: float, num_perm: int = 128) -> str:
    """Shared CTE chain reproducing functions/minhash.py bit-exactly in
    DuckDB: 3-char shingle polynomial hashes (codepoints, P=1000003, mod
    2^32) -> 128 universal hashes ((a*x+b) mod 2^61-1 mod 2^32, the
    RandomState(1) coefficients inlined as literals, HUGEINT arithmetic)
    -> per-perm segment min = signature -> banding by equality of the r
    raw signature values per band (band-hash collisions are 2^-64;
    equality of the r values IS the band-key semantics) -> verify
    est-Jaccard = fraction of equal signature components >= threshold.

    Ends with CTE ``p(id_a, id_b)`` — the verified pair set.  Assumes no
    document shorter than 3 chars (true of every testdata sf; the Ray
    kernel's short-string whole-text hash branch has its own pytest
    golden)."""
    from aml_entity_resolution_assignment_ray.functions import minhash as mh

    bands, rows = mh.optimal_param(threshold, num_perm)
    a, b = mh.permutations(num_perm)
    perm_vals = ",".join(
        f"({i},{int(a[i])},{int(b[i])})" for i in range(num_perm))
    ws = " \t\n\r\x0b\x0c"
    return f"""
        t AS (
          SELECT CAST(doc_id AS VARCHAR) AS id,
                 trim(lower(coalesce(text, '')), '{ws}') AS s
          FROM documents
        ),
        shingles AS (
          SELECT DISTINCT id,
                 (unicode(substr(s, i, 1)) * 1000006000009
                  + unicode(substr(s, i+1, 1)) * 1000003
                  + unicode(substr(s, i+2, 1))) % 4294967296 AS x
          FROM (SELECT id, s, unnest(generate_series(1, length(s) - 2)) AS i
                FROM t WHERE length(s) >= 3)
        ),
        perms(pid, pa, pb) AS (VALUES {perm_vals}),
        sig AS (
          SELECT id, pid,
                 min(CAST(((CAST(pa AS HUGEINT) * x + pb)
                           % 2305843009213693951) % 4294967296 AS BIGINT)) AS v
          FROM shingles CROSS JOIN perms GROUP BY id, pid
        ),
        bsig AS (
          SELECT id, pid // {rows} AS band,
                 string_agg(CAST(v AS VARCHAR), ',' ORDER BY pid) AS bkey
          FROM sig WHERE pid < {bands * rows}
          GROUP BY id, band
        ),
        cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM bsig a JOIN bsig b
            ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id
        ),
        ver AS (
          SELECT c.id_a, c.id_b,
                 sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) AS eq
          FROM cand c
          JOIN sig sa ON sa.id = c.id_a
          JOIN sig sb ON sb.id = c.id_b AND sb.pid = sa.pid
          GROUP BY c.id_a, c.id_b
        ),
        p AS (SELECT id_a, id_b FROM ver
              WHERE CAST(eq AS DOUBLE) / {num_perm} >= {threshold})
    """


def _minhash_pairs_sql(threshold: float = 0.5) -> str:
    return f"WITH {_minhash_cte(threshold)} SELECT id_a, id_b FROM p"


def _minhash_dedup_sql(threshold: float = 0.8) -> str:
    """Verified MinHash pairs + connected components as a recursive CTE:
    the closure reach(node, r) holds every (node, reachable id); the
    canonical id is the (string-)min reachable id — the same min-label
    semantics as stages/cluster.connected_components."""
    return f"""
        WITH RECURSIVE {_minhash_cte(threshold)},
        e AS (SELECT id_a AS u, id_b AS v FROM p
              UNION ALL SELECT id_b, id_a FROM p),
        reach(node, r) AS (
          SELECT id, id FROM t
          UNION
          SELECT e.v, reach.r FROM reach JOIN e ON e.u = reach.node
        )
        SELECT node AS doc_id, min(r) AS canonical_id
        FROM reach GROUP BY node
    """


def _incremental_minhash_sql(threshold: float = 0.8) -> str:
    """Replays incremental_minhash_dedup's two-ingest semantics in SQL,
    built on the bit-exact ``_minhash_cte`` pair set (band keys are
    per-doc, so the global verified-pair set restricted to an increment
    equals the pairs that ingest generates itself): connected
    components over pairs whose BOTH ends share an increment keep their
    (string-)min-id member; a second-increment survivor with a verified
    pair to a first-increment survivor drops (first-seen wins)."""
    mid = _table_rows(_oracle_sf_dir(), "documents") // 2
    return f"""
        WITH RECURSIVE {_minhash_cte(threshold)},
        g AS (SELECT id, CAST(id AS BIGINT) >= {mid} AS late FROM t),
        pe AS (SELECT p.id_a, p.id_b FROM p
               JOIN g ga ON ga.id = p.id_a
               JOIN g gb ON gb.id = p.id_b
               WHERE ga.late = gb.late),
        e AS (SELECT id_a AS u, id_b AS v FROM pe
              UNION ALL SELECT id_b, id_a FROM pe),
        reach(node, r) AS (
          SELECT id, id FROM t
          UNION
          SELECT e.v, reach.r FROM reach JOIN e ON e.u = reach.node
        ),
        w AS (SELECT node FROM (SELECT node, min(r) AS c FROM reach
                                GROUP BY node) WHERE node = c),
        s1 AS (SELECT w.node FROM w JOIN g ON g.id = w.node
               WHERE NOT g.late)
        SELECT CAST(node AS BIGINT) AS doc_id FROM s1
        UNION ALL
        SELECT CAST(w.node AS BIGINT) AS doc_id
        FROM w JOIN g ON g.id = w.node
        WHERE g.late AND NOT EXISTS (
          SELECT 1 FROM p JOIN s1
            ON (s1.node = p.id_a AND p.id_b = w.node)
            OR (s1.node = p.id_b AND p.id_a = w.node))
    """


def _simhash_pairs_sql(max_hamming: int = 6, nbits: int = 64) -> str:
    """ops/dedup.simhash_batch reproduced bit-exactly in DuckDB: shingle
    hashes (NOT distinct — votes count duplicate shingles) -> splitmix64
    spread to 64 bits (the two 64-bit multiplies decomposed into 32-bit
    halves so no HUGEINT overflow) -> per-bit majority vote -> pigeonhole
    bands (max_hamming+1 np.array_split groups) by bit-string equality ->
    exact hamming filter."""
    import numpy as np

    C1, C2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    M64, M32 = 1 << 64, 1 << 32
    bit_vals = ",".join(
        f"({b}, CAST('{1 << b}' AS HUGEINT))" for b in range(nbits))
    nbands = max_hamming + 1
    splits = np.array_split(np.arange(nbits), nbands)
    band_case = "CASE " + " ".join(
        f"WHEN b <= {int(s[-1])} THEN {i}" for i, s in enumerate(splits)
    ) + " END"
    ws = " \t\n\r\x0b\x0c"
    return f"""
        WITH t AS (
          SELECT CAST(doc_id AS VARCHAR) AS id,
                 trim(lower(coalesce(text, '')), '{ws}') AS s
          FROM documents
        ),
        sh AS (
          SELECT id,
                 (unicode(substr(s, i, 1)) * 1000006000009
                  + unicode(substr(s, i+1, 1)) * 1000003
                  + unicode(substr(s, i+2, 1))) % 4294967296 AS x
          FROM (SELECT id, s, unnest(generate_series(1, length(s) - 2)) AS i
                FROM t WHERE length(s) >= 3)
        ),
        m1 AS (
          SELECT id,
                 (CAST(xor(x, x // 1073741824) AS HUGEINT) * {C1}) % {M64} AS x1
          FROM sh
        ),
        m2 AS (
          SELECT id,
                 ((CAST(xor(CAST(x1 % {M32} AS BIGINT),
                            CAST((x1 // 134217728) % {M32} AS BIGINT)) AS HUGEINT) * {C2})
                  + ((CAST(xor(CAST(x1 // {M32} AS BIGINT),
                               CAST(x1 // 134217728 // {M32} AS BIGINT)) AS HUGEINT) * {C2})
                     % {M32}) * {M32}) % {M64} AS x2
          FROM m1
        ),
        m3 AS (
          SELECT id,
                 CAST(xor(CAST(x2 // {M32} AS BIGINT),
                          CAST(x2 // 2147483648 // {M32} AS BIGINT)) AS HUGEINT) * {M32}
                 + CAST(xor(CAST(x2 % {M32} AS BIGINT),
                            CAST((x2 // 2147483648) % {M32} AS BIGINT)) AS BIGINT) AS x3
          FROM m2
        ),
        bits(b, d) AS (VALUES {bit_vals}),
        votes AS (
          SELECT id, b,
                 CASE WHEN 2 * sum(CAST((x3 // d) % 2 AS BIGINT))
                           > count(*) THEN 1 ELSE 0 END AS bit
          FROM m3 CROSS JOIN bits
          GROUP BY id, b
        ),
        bsig AS (
          SELECT id, {band_case} AS band,
                 string_agg(CAST(bit AS VARCHAR), '' ORDER BY b) AS bkey
          FROM votes GROUP BY id, band
        ),
        cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM bsig a JOIN bsig b
            ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id
        ),
        ver AS (
          SELECT c.id_a, c.id_b,
                 sum(CASE WHEN va.bit <> vb.bit THEN 1 ELSE 0 END) AS hamming
          FROM cand c
          JOIN votes va ON va.id = c.id_a
          JOIN votes vb ON vb.id = c.id_b AND vb.b = va.b
          GROUP BY c.id_a, c.id_b
        )
        SELECT id_a, id_b FROM ver WHERE hamming <= {max_hamming}
    """


def _fingerprints_sql() -> str:
    """Winnowing fingerprints in SQL: the 8 smallest distinct 64-bit
    rolling polynomial hashes over 16-char windows, hex-packed — modular
    arithmetic via HUGEINT with the base powers precomputed inline (the
    same base/modulus as functions/minhash.batch_window_hashes)."""
    B, M = 1_000_003, 1 << 64
    plist = ", ".join(str(pow(B, k, M)) for k in range(16))
    return f"""
        WITH chars AS (
          SELECT doc_id, i, ord(substr(t, i, 1)) AS c
          FROM (SELECT doc_id, coalesce(text, '') AS t FROM documents),
               unnest(generate_series(1, length(t))) AS u(i)
        ),
        wins AS (
          SELECT doc_id, wi, least(n, 16) AS wlen
          FROM (SELECT doc_id, length(coalesce(text, '')) AS n FROM documents),
               unnest(generate_series(1, greatest(n - 15, 1))) AS u(wi)
          WHERE n > 0
        ),
        hashes AS (
          SELECT w.doc_id, w.wi,
                 CAST(sum(CAST(c.c AS HUGEINT)
                      * ([{plist}])[w.wlen - (c.i - w.wi)])
                      % 18446744073709551616 AS UBIGINT) AS h
          FROM wins w JOIN chars c
            ON c.doc_id = w.doc_id AND c.i >= w.wi AND c.i < w.wi + w.wlen
          GROUP BY w.doc_id, w.wi
        ),
        uniq AS (
          SELECT doc_id, h,
                 row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn
          FROM (SELECT DISTINCT doc_id, h FROM hashes)
        )
        SELECT d.doc_id, coalesce(f.fp, '') AS fingerprint
        FROM documents d
        LEFT JOIN (
          SELECT doc_id,
                 string_agg(lpad(lower(hex(h)), 16, '0'), ',' ORDER BY h) AS fp
          FROM uniq WHERE rn <= 8 GROUP BY doc_id) f USING (doc_id)
    """


def _emb_lsh_sql(threshold: float = 0.4, nplanes: int = 8,
                 nbands: int = 4, d: int = 64) -> str:
    """Random-hyperplane LSH + exact-cosine verify in SQL, mirroring
    ops/dedup.embedding_dup_pairs exactly: the same RandomState(7)
    plane matrix is inlined as full-precision literals (sign buckets
    are invariant to the Ray side's L2 normalization, so raw embeddings
    cast to DOUBLE give identical band buckets)."""
    planes = np.random.RandomState(7).randn(d, nplanes)
    width = nplanes // nbands
    dots = []
    for j in range(nplanes):
        lit = "[" + ",".join(repr(v) for v in planes[:, j]) + "]"
        dots.append(f"list_dot_product(e, {lit}) AS dot{j}")
    buckets = []
    for b in range(nbands):
        bits = " + ".join(
            f"(CASE WHEN dot{b * width + j} > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(width))
        buckets.append(f"SELECT id, {b} AS band, {bits} AS bucket FROM dots")
    bucket_union = " UNION ALL ".join(buckets)
    return f"""
        WITH v AS (
          SELECT CAST(vec_id AS VARCHAR) AS id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings
        ),
        dots AS (SELECT id, e, {", ".join(dots)} FROM v),
        bk AS ({bucket_union}),
        cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM bk a JOIN bk b
            ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
        )
        SELECT c.id_a, c.id_b
        FROM cand c
        JOIN v va ON va.id = c.id_a
        JOIN v vb ON vb.id = c.id_b
        WHERE list_cosine_similarity(va.e, vb.e) >= {threshold}
    """


def _bpe_spaced_sql_expr(col: str = "text") -> str:
    """The spaced BPE working layout (single spaces inside a pretoken,
    double between, leading/trailing space) as a SQL expression —
    shared by the merge-APPLY oracle (_bpe_merged_sql_expr) and the
    merge-TRAINING oracle (_bpe_train_sql).

    coalesce: DuckDB's array_to_string returns NULL (not '') on an
    empty list, i.e. on empty/whitespace-only documents."""
    from aml_entity_resolution_assignment_ray.ops.text import ws_normalize_sql

    return (
        "' ' || coalesce(array_to_string(list_transform("
        f"regexp_extract_all(lower({ws_normalize_sql(col)}), "
        r"'[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+'), "
        r"p -> trim(regexp_replace(p, '(.)', '\1 ', 'g'))), '  '), '') || ' '"
    )


def _bpe_train_sql(n_merges: int = 8) -> str:
    """BPE TRAINING replay, one generated CTE stage per round: count
    adjacent within-pretoken pairs (every position, overlapping repeats
    included), pick (count DESC, a, b) — binary VARCHAR order matching
    the Python sort — then apply just that merge with the shared
    double-replace semantics.  r/m stages are MATERIALIZED: each is
    referenced twice and naive CTE inlining would re-derive the whole
    prefix chain per reference."""
    parts = [f"r1 AS MATERIALIZED (SELECT doc_id, "
             f"{_bpe_spaced_sql_expr('text')} AS s FROM documents)"]
    selects = []
    for k in range(1, n_merges + 1):
        parts.append(f"""
        u{k} AS (
          SELECT string_split(trim(pre), ' ') AS us
          FROM (SELECT unnest(string_split(s, '  ')) AS pre FROM r{k})
          WHERE trim(pre) <> ''
        ),
        p{k} AS (
          SELECT us[i] AS a, us[i + 1] AS b, count(*) AS c
          FROM (SELECT us, unnest(generate_series(1, len(us) - 1)) AS i
                FROM u{k} WHERE len(us) >= 2)
          GROUP BY a, b
        ),
        m{k} AS MATERIALIZED (
          SELECT a, b, c FROM p{k} ORDER BY c DESC, a, b LIMIT 1
        ),
        r{k + 1} AS MATERIALIZED (
          SELECT doc_id,
                 replace(replace(r.s,
                         ' ' || m.a || ' ' || m.b || ' ',
                         ' ' || m.a || m.b || ' '),
                         ' ' || m.a || ' ' || m.b || ' ',
                         ' ' || m.a || m.b || ' ') AS s
          FROM r{k} r, m{k} m
        )""")
        selects.append(f"SELECT {k} AS merge_rank, a, b, "
                       f"CAST(c AS BIGINT) AS pair_count FROM m{k}")
    return ("WITH " + ",".join(parts) + " "
            + " UNION ALL ".join(selects))


def _bpe_merged_sql_expr(col: str = "text") -> str:
    """The merge-table BPE count as one SQL expression, compiled from
    the SAME ``_BPE_MERGES`` table and pretokenizer regex as
    ops/text.bpe_merge_token_count: char-space each pretoken (single
    spaces inside, double between), apply each merge as two
    left-to-right non-overlapping replace() calls (Python str.replace
    semantics), count the space-separated units."""
    from aml_entity_resolution_assignment_ray.ops.text import _BPE_MERGES

    expr = _bpe_spaced_sql_expr(col)
    for a, b in _BPE_MERGES:
        pat, rep = f" {a} {b} ", f" {a}{b} "
        expr = f"replace(replace({expr}, '{pat}', '{rep}'), '{pat}', '{rep}')"
    return f"CAST(length(regexp_extract_all({expr}, '[^ ]+')) AS BIGINT)"


def _bpe_histogram_sql() -> str:
    """Corpus subword histogram oracle: the SAME spaced layout +
    replace() merge chain as _bpe_merged_sql_expr, then unnest the
    split and count per subword (ops/text.bpe_token_histogram)."""
    from aml_entity_resolution_assignment_ray.ops.text import _BPE_MERGES

    expr = _bpe_spaced_sql_expr("text")
    for a, b in _BPE_MERGES:
        pat, rep = f" {a} {b} ", f" {a}{b} "
        expr = f"replace(replace({expr}, '{pat}', '{rep}'), '{pat}', '{rep}')"
    return f"""
        WITH tok AS (
            SELECT unnest(regexp_extract_all({expr}, '[^ ]+')) AS token
            FROM documents
        )
        SELECT token, count(*) AS n FROM tok GROUP BY token
    """


def _bpe_encode_sql() -> str:
    """Encode-to-ids oracle: the SAME spaced layout + replace() merge
    chain as _bpe_histogram_sql, but per doc with ORDINAL positions,
    joined to the vocabulary the engine persisted
    (ops/text.bpe_encode's model-as-input parquet)."""
    from aml_entity_resolution_assignment_ray.ops.text import _BPE_MERGES

    expr = _bpe_spaced_sql_expr("text")
    for a, b in _BPE_MERGES:
        pat, rep = f" {a} {b} ", f" {a}{b} "
        expr = f"replace(replace({expr}, '{pat}', '{rep}'), '{pat}', '{rep}')"
    return f"""
        WITH m AS (
            SELECT doc_id, regexp_extract_all({expr}, '[^ ]+') AS toks
            FROM documents WHERE doc_id % 7 = 0
        ),
        t AS (
            SELECT doc_id, unnest(toks) AS tok,
                   generate_subscripts(toks, 1) AS pos
            FROM m
        ),
        v AS (SELECT token, token_id FROM read_parquet(
                  '{_bpe_vocab_path(_oracle_n())}/vocab.parquet'))
        SELECT t.doc_id, CAST(t.pos - 1 AS BIGINT) AS pos, v.token_id
        FROM t JOIN v ON v.token = t.tok
    """


def _projection_sign_values_sql(d: int = 64, k: int = 8,
                                seed: int = 7) -> str:
    """The random_projection_q8 sign matrix as a SQL VALUES literal —
    the model-in-the-query convention (cf. the GBDT tree compile): the
    oracle replays the projection from the same d x k +-1 matrix the
    engine derives from the seed."""
    from aml_entity_resolution_assignment_ray.ops.ann import (
        projection_sign_matrix,
    )

    R = projection_sign_matrix(d, k, seed)
    rows = ", ".join(f"({i}, {j}, {int(R[i, j])})"
                     for i in range(d) for j in range(k))
    return f"(VALUES {rows}) AS r(dim, comp, sign)"


def _media_features_sql(out: int = 32) -> str:
    """Replays ops/multimodal ResizeImage + ImageFeatures over the
    decoded pixel tensors the media_features query persists: the
    nearest-neighbor source-index arithmetic is integer, and every
    feature is one fixed float64 expression over exact integer sums —
    bit-identical to the numpy kernel (see ImageFeatures docstring)."""
    npix = out * out
    sums, chans = [], {"r": 1, "g": 2, "b": 3}
    for name, off in chans.items():
        sums.append(
            f"CAST(list_extract(d.pixels, ((oy*h)//{out})*(w*3)"
            f" + ((ox*w)//{out})*3 + {off}) AS BIGINT) AS {name}")
    feat = []
    for name in chans:
        feat.append(f"round((CAST(sum({name}) AS DOUBLE)/{npix})/255.0, 6)"
                    f" AS mean_{name}")
    for name in chans:
        m = f"(CAST(sum({name}) AS DOUBLE)/{npix})"
        feat.append(
            f"round(sqrt(greatest(CAST(sum({name}*{name}) AS DOUBLE)/{npix}"
            f" - {m}*{m}, 0))/255.0, 6) AS std_{name}")
    for k in range(8):
        feat.append(
            f"round(CAST(sum(CASE WHEN (r+g+b)//96 = {k} THEN 1 ELSE 0 END)"
            f" AS DOUBLE)/{npix}, 6) AS h{k}")
    return f"""
        WITH dec AS (
          SELECT media_id, pixels,
                 CAST(shape[1] AS BIGINT) AS h,
                 CAST(shape[2] AS BIGINT) AS w
          FROM read_parquet('/tmp/er_media/decoded.parquet')
        ),
        rgb AS (
          SELECT d.media_id, {", ".join(sums)}
          FROM dec d, range({out}) AS ys(oy), range({out}) AS xs(ox)
        )
        SELECT media_id, {", ".join(feat)}
        FROM rgb GROUP BY media_id
    """


def _kcore_sql(k: int, rounds: int) -> str:
    """k-core replay, one generated CTE stage per peel round (degree
    count -> alive filter -> edge semi-join), mirroring
    ops/graph.k_core exactly.  ``rounds`` only needs to be >= the peel
    depth — extra rounds are no-ops (the engine iterates to the same
    fixpoint), and the TPC-H-shaped graphs converge in 1-2."""
    parts = ["""
    e0 AS MATERIALIZED (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
             's' || CAST(l_suppkey AS VARCHAR) AS b
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    )"""]
    for i in range(rounds):
        parts.append(f"""
    d{i} AS MATERIALIZED (
      SELECT node, count(*) AS deg FROM
        (SELECT a AS node FROM e{i}
         UNION ALL SELECT b AS node FROM e{i}) u
      GROUP BY node
    ),
    a{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE deg >= {k}),
    e{i + 1} AS MATERIALIZED (
      SELECT e.a, e.b FROM e{i} e
      JOIN a{i} x ON e.a = x.node
      JOIN a{i} y ON e.b = y.node
    )""")
    parts.append(f"""
    dfin AS (
      SELECT node, count(*) AS deg FROM
        (SELECT a AS node FROM e{rounds}
         UNION ALL SELECT b AS node FROM e{rounds}) u
      GROUP BY node
    )""")
    return ("WITH " + ",".join(parts)
            + f" SELECT node, deg FROM dfin WHERE deg >= {k}")


def _greedy_cover_sql(k: int) -> str:
    """Greedy max-coverage replay, one generated CTE stage per round
    (gain counts over not-yet-covered words -> deterministic argmax ->
    covered-set union), mirroring ops/sample.greedy_cover_select."""
    parts = ["""
    toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(
                 lower(coalesce(text, '')), '[a-z0-9]+')) AS w,
             generate_subscripts(regexp_extract_all(
                 lower(coalesce(text, '')), '[a-z0-9]+'), 1) AS i
      FROM documents
    ),
    t AS MATERIALIZED (
      SELECT DISTINCT doc_id, w || ' '
             || lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS word
      FROM toks
      QUALIFY lead(w) OVER (PARTITION BY doc_id ORDER BY i) IS NOT NULL
    )"""]
    sel = []
    for r in range(1, k + 1):
        cov = (f"WHERE word NOT IN (SELECT word FROM c{r - 1})"
               if r > 1 else "")
        parts.append(f"""
    g{r} AS (SELECT doc_id, count(*) AS gain FROM t {cov} GROUP BY 1),
    w{r} AS (SELECT doc_id, gain FROM g{r}
             ORDER BY gain DESC, doc_id LIMIT 1),
    c{r} AS MATERIALIZED (
      {f'SELECT word FROM c{r - 1} UNION ' if r > 1 else ''}
      SELECT DISTINCT word FROM t JOIN w{r} USING (doc_id)
    )""")
        sel.append(
            f"SELECT CAST({r} AS BIGINT) AS round, doc_id,"
            f" CAST(gain AS BIGINT) AS gain,"
            f" (SELECT count(*) FROM c{r}) AS covered_total FROM w{r}")
    return "WITH " + ",".join(parts) + " " + " UNION ALL ".join(sel)


def _aa_weight_values() -> str:
    """Adamic-Adar per-degree weight VALUES for the oracle — generated
    from the SAME math.log table ops/graph.adamic_adar uses."""
    from aml_entity_resolution_assignment_ray.ops.graph import (
        adamic_adar_weight_values,
    )

    return adamic_adar_weight_values(scale=10 ** 9, max_degree=64)


def _lpa_sql(iterations: int = 3) -> str:
    """Synchronous label-propagation replay, one generated CTE stage
    per round (mirrors ops/graph.label_propagation exactly): every
    node adopts its neighbors' modal label, ties to the smallest
    label; fixed round count keeps the replay deterministic."""
    parts = ["""
    e AS MATERIALIZED (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
             's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    adj AS MATERIALIZED (
      SELECT DISTINCT node, nbr FROM (
        SELECT src AS node, dst AS nbr FROM e
        UNION ALL SELECT dst, src FROM e)
      WHERE node <> nbr
    ),
    l0 AS MATERIALIZED (
      SELECT DISTINCT node, node AS label FROM adj
    )"""]
    for k in range(1, iterations + 1):
        parts.append(f"""
    c{k} AS MATERIALIZED (
      SELECT a.node, l.label, count(*) AS c
      FROM adj a JOIN l{k - 1} l ON l.node = a.nbr
      GROUP BY a.node, l.label
    ),
    l{k} AS MATERIALIZED (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY c DESC, label ASC) AS rn
        FROM c{k})
      WHERE rn = 1
    )""")
    return ("WITH " + ",".join(parts)
            + f"\nSELECT node, label FROM l{iterations}")


def _pagerank_sql(iterations: int = 3, scale: int = 10 ** 12) -> str:
    """PageRank replay, one generated CTE stage per power-iteration
    round, mirroring ops/graph.pagerank's integer recurrence exactly:
    rank // outdeg contributions, integer sums (order-invariant), the
    dangling pool and teleport as floor divisions.  Every rank is
    BIGINT so the replay is bit-for-bit."""
    parts = [f"""
    e AS MATERIALIZED (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
             's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    nodes AS MATERIALIZED (
      SELECT src AS node FROM e UNION SELECT dst FROM e
    ),
    deg AS MATERIALIZED (
      SELECT src AS node, count(*) AS d FROM e GROUP BY 1
    ),
    nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
    r0 AS MATERIALIZED (
      SELECT node, CAST({scale} // (SELECT n FROM nn) AS BIGINT) AS pr
      FROM nodes
    )"""]
    for k in range(1, iterations + 1):
        parts.append(f"""
    d{k} AS MATERIALIZED (
      SELECT COALESCE(sum(r.pr), 0) AS dang
      FROM r{k - 1} r LEFT JOIN deg g ON g.node = r.node
      WHERE g.node IS NULL
    ),
    i{k} AS MATERIALIZED (
      SELECT e.dst AS node, sum(r.pr // g.d) AS s
      FROM e JOIN r{k - 1} r ON r.node = e.src
             JOIN deg g ON g.node = e.src
      GROUP BY 1
    ),
    r{k} AS MATERIALIZED (
      SELECT n.node,
             CAST((15 * {scale}) // (100 * (SELECT n FROM nn))
                  + (85 * (SELECT dang FROM d{k}))
                    // (100 * (SELECT n FROM nn))
                  + (85 * COALESCE(i.s, 0)) // 100 AS BIGINT) AS pr
      FROM nodes n LEFT JOIN i{k} i ON i.node = n.node
    )""")
    return ("WITH " + ",".join(parts)
            + f" SELECT node, pr FROM r{iterations}")


def oracle_sql() -> dict[str, str]:
    from aml_entity_resolution_assignment_ray.ops.text import (
        CTRL_SQL_CLASS,
        WS_DISAGREE_SQL_CLASS,
        ws_normalize_sql,
    )

    _WS_NORM_TEXT = ws_normalize_sql("text")
    return {
        "doc_fingerprints": _fingerprints_sql(),
        "media_features": _media_features_sql(),
        # average-hash replay: 8x8 nearest resize (the same floor-index
        # arithmetic as _media_features_sql), integer BT.601 gray,
        # threshold 64*gray > sum(gray) — all integer, every bit exact
        "image_ahash": """
            WITH dec AS (
              SELECT media_id, pixels,
                     CAST(shape[1] AS BIGINT) AS h,
                     CAST(shape[2] AS BIGINT) AS w
              FROM read_parquet('/tmp/er_media/ahash_decoded.parquet')
            ),
            g AS (
              SELECT d.media_id, oy * 8 + ox AS bit_idx,
                     (CAST(list_extract(d.pixels,
                          ((oy*h)//8)*(w*3) + ((ox*w)//8)*3 + 1)
                          AS BIGINT) * 299
                      + CAST(list_extract(d.pixels,
                          ((oy*h)//8)*(w*3) + ((ox*w)//8)*3 + 2)
                          AS BIGINT) * 587
                      + CAST(list_extract(d.pixels,
                          ((oy*h)//8)*(w*3) + ((ox*w)//8)*3 + 3)
                          AS BIGINT) * 114) // 1000 AS gray
              FROM dec d, range(8) AS ys(oy), range(8) AS xs(ox)
            ),
            t AS (SELECT media_id, sum(gray) AS total FROM g GROUP BY 1)
            SELECT g.media_id, CAST(bit_idx AS BIGINT) AS bit_idx,
                   CAST(CASE WHEN 64 * gray > total THEN 1 ELSE 0 END
                        AS BIGINT) AS bit
            FROM g JOIN t USING (media_id)
        """,
        # ahash near-dup pairs: recompute every bit from the persisted
        # decode (same expressions as image_ahash), then an all-pairs
        # hamming join — tiny here; the engine uses banding instead and
        # must produce identical pairs and distances
        "image_ahash_dups": """
            WITH dec AS (
              SELECT media_id, pixels,
                     CAST(shape[1] AS BIGINT) AS h,
                     CAST(shape[2] AS BIGINT) AS w
              FROM read_parquet('/tmp/er_media/ahash_pairs_decoded.parquet')
            ),
            g AS (
              SELECT d.media_id, oy * 8 + ox AS bit_idx,
                     (CAST(list_extract(d.pixels,
                          ((oy*h)//8)*(w*3) + ((ox*w)//8)*3 + 1)
                          AS BIGINT) * 299
                      + CAST(list_extract(d.pixels,
                          ((oy*h)//8)*(w*3) + ((ox*w)//8)*3 + 2)
                          AS BIGINT) * 587
                      + CAST(list_extract(d.pixels,
                          ((oy*h)//8)*(w*3) + ((ox*w)//8)*3 + 3)
                          AS BIGINT) * 114) // 1000 AS gray
              FROM dec d, range(8) AS ys(oy), range(8) AS xs(ox)
            ),
            t AS (SELECT media_id, sum(gray) AS total FROM g GROUP BY 1),
            bits AS (
              SELECT g.media_id, g.bit_idx,
                     CASE WHEN 64 * gray > total THEN 1 ELSE 0 END AS bit
              FROM g JOIN t USING (media_id)
            ),
            hm AS (
              SELECT a.media_id AS id_a, b.media_id AS id_b,
                     sum(abs(a.bit - b.bit)) AS hamming
              FROM bits a JOIN bits b
                ON a.bit_idx = b.bit_idx AND a.media_id < b.media_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
            FROM hm WHERE hamming <= 6
        """,
        # dup clusters: the same recomputed pair set, closed transitively
        # by recursive reachability; label = component min media_id
        "image_dup_clusters": """
            WITH RECURSIVE dec AS (
              SELECT media_id, pixels,
                     CAST(shape[1] AS BIGINT) AS h,
                     CAST(shape[2] AS BIGINT) AS w
              FROM read_parquet('/tmp/er_media/ahash_pairs_decoded.parquet')
            ),
            g AS (
              SELECT d.media_id, oy * 8 + ox AS bit_idx,
                     (CAST(list_extract(d.pixels,
                          ((oy*h)//8)*(w*3) + ((ox*w)//8)*3 + 1)
                          AS BIGINT) * 299
                      + CAST(list_extract(d.pixels,
                          ((oy*h)//8)*(w*3) + ((ox*w)//8)*3 + 2)
                          AS BIGINT) * 587
                      + CAST(list_extract(d.pixels,
                          ((oy*h)//8)*(w*3) + ((ox*w)//8)*3 + 3)
                          AS BIGINT) * 114) // 1000 AS gray
              FROM dec d, range(8) AS ys(oy), range(8) AS xs(ox)
            ),
            t AS (SELECT media_id, sum(gray) AS total FROM g GROUP BY 1),
            bits AS (
              SELECT g.media_id, g.bit_idx,
                     CASE WHEN 64 * gray > total THEN 1 ELSE 0 END AS bit
              FROM g JOIN t USING (media_id)
            ),
            hm AS (
              SELECT a.media_id AS id_a, b.media_id AS id_b
              FROM bits a JOIN bits b
                ON a.bit_idx = b.bit_idx AND a.media_id < b.media_id
              GROUP BY 1, 2
              HAVING sum(abs(a.bit - b.bit)) <= 6
            ),
            e AS (SELECT id_a AS u, id_b AS v FROM hm
                  UNION ALL SELECT id_b, id_a FROM hm),
            reach(node, r) AS (
              SELECT media_id, media_id FROM dec
              UNION
              SELECT e.v, reach.r FROM reach JOIN e ON e.u = reach.node
            )
            SELECT node AS media_id, min(r) AS canonical_id
            FROM reach GROUP BY node
        """,
        "corpus_prep": _corpus_prep_sql(),
        # ExactSubstr span removal: every token 8-gram OCCURRENCE (not
        # the per-doc distinct set) with count >= 2 covers its 8
        # positions; docs reassemble from the surviving tokens in the
        # normalized (lower + ws-collapsed) token space
        "doc_substring_dedup": f"""
            WITH norm AS (
              SELECT doc_id,
                     lower(trim(regexp_replace({ws_normalize_sql("text")},
                                               '\\s+', ' ', 'g'))) AS t
              FROM documents
            ),
            toks AS (SELECT doc_id, string_split(t, ' ') AS toks
                     FROM norm WHERE t <> ''),
            occ AS (
              SELECT doc_id, i,
                     array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
              FROM (SELECT doc_id, toks,
                           unnest(generate_series(1, len(toks) - 7)) AS i
                    FROM toks WHERE len(toks) >= 8)
            ),
            dup AS (SELECT gram FROM occ GROUP BY gram HAVING count(*) >= 2),
            cover AS (
              SELECT DISTINCT o.doc_id, o.i + r.range AS p
              FROM occ o JOIN dup USING (gram) CROSS JOIN range(8) r
            ),
            tk AS (
              SELECT doc_id, unnest(toks) AS tok,
                     unnest(generate_series(1, len(toks))) AS p
              FROM toks
            ),
            kept AS (
              SELECT tk.doc_id, tk.p, tk.tok
              FROM tk LEFT JOIN cover c
                ON c.doc_id = tk.doc_id AND c.p = tk.p
              WHERE c.p IS NULL
            ),
            agg AS (
              SELECT doc_id, count(*) AS n_kept,
                     string_agg(tok, ' ' ORDER BY p) AS cleaned
              FROM kept GROUP BY doc_id
            ),
            tot AS (SELECT doc_id, len(toks) AS n_tokens FROM toks)
            SELECT d.doc_id,
                   CAST(coalesce(t.n_tokens, 0) AS BIGINT) AS n_tokens,
                   CAST(coalesce(t.n_tokens, 0) - coalesce(a.n_kept, 0)
                        AS BIGINT) AS n_removed,
                   coalesce(a.cleaned, '') AS cleaned_text
            FROM (SELECT doc_id FROM documents) d
            LEFT JOIN tot t USING (doc_id)
            LEFT JOIN agg a USING (doc_id)
        """,
        # duplicate-span signal: distinct token 8-grams (same tokenize
        # contract as doc_contamination), gram doc-frequency >= 2
        "doc_dup_grams": f"""
            WITH norm AS (
              SELECT doc_id,
                     lower(trim(regexp_replace({ws_normalize_sql("text")},
                                               '\\s+', ' ', 'g'))) AS t
              FROM documents
            ),
            grams AS (
              SELECT DISTINCT doc_id,
                     array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
              FROM (
                SELECT doc_id, toks,
                       unnest(generate_series(1, len(toks) - 7)) AS i
                FROM (SELECT doc_id, string_split(t, ' ') AS toks
                      FROM norm WHERE t <> '')
                WHERE len(toks) >= 8)
            ),
            tot AS (
              SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id
            ),
            dfq AS (
              SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2
            ),
            dupc AS (
              SELECT g.doc_id, count(*) AS n_dup
              FROM grams g JOIN dfq USING (gram) GROUP BY g.doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(t.n_grams, 0) AS BIGINT) AS n_grams,
                   CAST(coalesce(c.n_dup, 0) AS BIGINT) AS n_dup_grams,
                   round(CAST(coalesce(c.n_dup, 0) AS DOUBLE)
                         / greatest(coalesce(t.n_grams, 0), 1), 6)
                     AS dup_fraction
            FROM (SELECT doc_id FROM documents) d
            LEFT JOIN tot t USING (doc_id)
            LEFT JOIN dupc c USING (doc_id)
        """,
        "audio_frames": """
            WITH dec AS (
              SELECT media_id, samples, channels
              FROM read_parquet('/tmp/er_media/audio_frames_decoded.parquet')
            ),
            ex AS (
              SELECT media_id, channels,
                     unnest(samples) AS s,
                     unnest(range(len(samples))) AS i
              FROM dec
            )
            SELECT media_id,
                   CAST((i // channels) // 256 AS BIGINT) AS frame_idx,
                   round(sqrt(CAST(sum(CAST(s AS BIGINT) * CAST(s AS BIGINT))
                                   AS DOUBLE) / 256) / 32768.0, 6)
                     AS frame_rms
            FROM ex WHERE i % channels = 0
            GROUP BY media_id, (i // channels) // 256
            HAVING count(*) = 256
        """,
        "audio_features": """
            WITH dec AS (
              SELECT media_id, samples, n_samples, channels, sample_rate
              FROM read_parquet('/tmp/er_media/audio_decoded.parquet')
            ),
            ex AS (
              SELECT media_id, channels,
                     unnest(samples) AS s,
                     unnest(range(len(samples))) AS i
              FROM dec
            ),
            agg AS (
              SELECT media_id, count(*) AS n_el,
                     sum(CAST(s AS BIGINT)) AS ssum,
                     sum(CAST(s AS BIGINT) * CAST(s AS BIGINT)) AS ssq,
                     max(abs(CAST(s AS BIGINT))) AS pk
              FROM ex GROUP BY media_id
            ),
            ch0 AS (
              SELECT media_id, i, (s >= 0) AS nn,
                     lag(s >= 0) OVER (PARTITION BY media_id ORDER BY i)
                       AS pnn
              FROM ex WHERE i % channels = 0
            ),
            zc AS (
              SELECT media_id,
                     CAST(sum(CASE WHEN pnn IS NOT NULL AND nn != pnn
                              THEN 1 ELSE 0 END) AS BIGINT)
                       AS zero_crossings
              FROM ch0 GROUP BY media_id
            )
            SELECT d.media_id, d.n_samples, d.channels, d.sample_rate,
                   round(CAST(d.n_samples AS DOUBLE) / d.sample_rate, 6)
                     AS duration_sec,
                   round((CAST(a.ssum AS DOUBLE) / a.n_el) / 32768.0, 6)
                     AS mean_amp,
                   round(sqrt(CAST(a.ssq AS DOUBLE) / a.n_el) / 32768.0, 6)
                     AS rms,
                   round(CAST(a.pk AS DOUBLE) / 32768.0, 6) AS peak,
                   z.zero_crossings
            FROM dec d
            JOIN agg a USING (media_id)
            JOIN zc z USING (media_id)
        """,
        "embedding_dup_pairs_lsh": _emb_lsh_sql(threshold=0.4),
        "minhash_dup_pairs_docs": _minhash_pairs_sql(threshold=0.5),
        "minhash_dedup_docs": _minhash_dedup_sql(threshold=0.8),
        "minhash_dedup_incremental": _incremental_minhash_sql(0.8),
        "simhash_dup_pairs_docs": _simhash_pairs_sql(max_hamming=6),
        "doc_greedy_cover": _greedy_cover_sql(5),
        "doc_cosine_pairs": """
            WITH tok AS (
              SELECT doc_id, unnest(regexp_extract_all(
                         lower(coalesce(text, '')), '[a-z0-9]+')) AS word
              FROM documents
            ),
            tf AS (SELECT doc_id, word, count(*) AS tf
                   FROM tok GROUP BY 1, 2),
            dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
            kept AS (SELECT word FROM dfreq WHERE df >= 2),
            ftf AS (SELECT tf.* FROM tf JOIN kept USING (word)),
            norm AS (SELECT doc_id, sum(tf * tf) AS n2
                     FROM ftf GROUP BY 1),
            dot AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                           sum(a.tf * b.tf) AS d
                    FROM ftf a JOIN ftf b ON a.word = b.word
                         AND a.doc_id < b.doc_id
                    GROUP BY 1, 2)
            SELECT id_a, id_b,
                   CAST(d AS DOUBLE)
                       / (sqrt(CAST(na.n2 AS DOUBLE))
                          * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
            FROM dot JOIN norm na ON na.doc_id = id_a
                 JOIN norm nb ON nb.doc_id = id_b
            WHERE CAST(d AS DOUBLE)
                      / (sqrt(CAST(na.n2 AS DOUBLE))
                         * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.9
        """,
        "ngram_jaccard_docs": """
            WITH g AS (
              SELECT DISTINCT id, substr(t, i, 3) AS gram
              FROM (
                SELECT CAST(doc_id AS VARCHAR) AS id,
                       lower(coalesce(text, '')) AS t,
                       unnest(generate_series(
                           1, greatest(length(coalesce(text, '')) - 2, 1))) AS i
                FROM documents)
            ),
            c AS (SELECT id, count(*) AS n FROM g GROUP BY id),
            inter AS (
              SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
              FROM g a JOIN g b ON a.gram = b.gram AND a.id < b.id
              GROUP BY a.id, b.id
            )
            SELECT id_a, id_b
            FROM inter
            JOIN c ca ON ca.id = id_a
            JOIN c cb ON cb.id = id_b
            WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5
        """,
        "embedding_dup_pairs": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(
                list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                list_transform(b.embedding, x -> CAST(x AS DOUBLE))) >= 0.4
        """,
        # SemDeDup replay: the cell assignment is read from the
        # PERSISTED cell-partitioned index (the `_cell` hive key IS the
        # assignment the Ray side wrote), then the within-cell self-join
        # + exact cosine mirrors ops/dedup.semdedup_pairs; ids compare
        # as VARCHAR (the candidate-pair canonical order)
        "semdedup_pairs": f"""
            WITH v AS (
              SELECT CAST(vec_id AS VARCHAR) AS id,
                     CAST(_cell AS BIGINT) AS cell,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM read_parquet(
                  '{_semdedup_index_path(_oracle_n())}/cells/*/*.parquet',
                  hive_partitioning = 1)
            )
            SELECT a.id AS id_a, b.id AS id_b
            FROM v a JOIN v b ON a.cell = b.cell AND a.id < b.id
            WHERE list_cosine_similarity(a.e, b.e) >= 0.4
        """,
        "semdedup_clusters": f"""
            WITH RECURSIVE vt AS (
              SELECT CAST(vec_id AS VARCHAR) AS id,
                     CAST(_cell AS BIGINT) AS cell,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM read_parquet(
                  '{_semdedup_index_path(_oracle_n())}/cells/*/*.parquet',
                  hive_partitioning = 1)
            ),
            p AS (
              SELECT a.id AS id_a, b.id AS id_b
              FROM vt a JOIN vt b ON a.cell = b.cell AND a.id < b.id
              WHERE list_cosine_similarity(a.e, b.e) >= 0.4
            ),
            e AS (SELECT id_a AS u, id_b AS v FROM p
                  UNION ALL SELECT id_b, id_a FROM p),
            reach(node, r) AS (
              SELECT id, id FROM vt
              UNION
              SELECT e.v, reach.r FROM reach JOIN e ON e.u = reach.node
            )
            SELECT node AS vec_id, min(r) AS canonical_id
            FROM reach GROUP BY node
        """,
        "semdedup_keep": f"""
            WITH v AS (
              SELECT CAST(vec_id AS VARCHAR) AS id,
                     CAST(_cell AS BIGINT) AS cell,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM read_parquet(
                  '{_semdedup_index_path(_oracle_n())}/cells/*/*.parquet',
                  hive_partitioning = 1)
            ),
            dropped AS (
              SELECT DISTINCT b.id
              FROM v a JOIN v b ON a.cell = b.cell AND a.id < b.id
              WHERE list_cosine_similarity(a.e, b.e) >= 0.4
            )
            SELECT vec_id FROM embeddings
            WHERE CAST(vec_id AS VARCHAR) NOT IN (SELECT id FROM dropped)
        """,
        "doc_lang_id": _lang_id_sql(),
        "er_profiles": _er_profiles_sql(),
        "er_pairs_exact_keys": _er_pairs_exact_sql(),
        "er_turn_collapse": f"""
            WITH t AS (
                SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
                       text,
                       lag(text) OVER (PARTITION BY conv_id
                                       ORDER BY turn_idx) AS prev
                FROM read_parquet('{_oracle_corpus_path(_oracle_n())}')
            )
            SELECT conv_id, turn_idx, text
            FROM t WHERE prev IS NULL OR text <> prev
        """,
        "er_dialogue_stats": f"""
            WITH t AS (
                SELECT conv_id, turn_idx, role, tool,
                       coalesce(text, '') AS text,
                       lag(role) OVER (PARTITION BY conv_id
                                       ORDER BY turn_idx) AS prev_role
                FROM read_parquet('{_oracle_corpus_path(_oracle_n())}')
            )
            SELECT conv_id,
                   count(*) AS n_turns,
                   CAST(sum(CASE WHEN prev_role IS NOT NULL
                                  AND role <> prev_role
                            THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_role_switches,
                   CAST(sum(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_tool_turns,
                   CAST(sum(length(text)) AS BIGINT) AS n_chars
            FROM t GROUP BY conv_id
        """,
        "er_email_consistency": f"""
            WITH profiles AS ({{PROF}}),
            x AS (
                SELECT conv_id,
                       split_part(coalesce(norm_email, ''), '@', 1)
                         AS local,
                       regexp_replace(coalesce(norm_first_name, ''),
                                      '[^a-z0-9]', '', 'g') AS fn,
                       regexp_replace(coalesce(norm_last_name, ''),
                                      '[^a-z0-9]', '', 'g') AS ln
                FROM profiles
            )
            SELECT conv_id,
                   (length(fn) >= 3 AND strpos(local, fn) > 0)
                   OR (length(ln) >= 3 AND strpos(local, ln) > 0)
                     AS email_name_consistent
            FROM x
        """.replace("{PROF}", _er_profiles_sql()),
        "er_response_latency": f"""
            WITH t AS (
                SELECT conv_id, turn_idx, role, epoch_us(ts) AS tus,
                       lag(role) OVER w AS prev_role,
                       lag(epoch_us(ts)) OVER w AS prev_tus
                FROM read_parquet('{_oracle_corpus_path(_oracle_n())}')
                WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
            )
            SELECT conv_id, count(*) AS n_exchanges,
                   CAST(sum(tus - prev_tus) AS BIGINT)
                     AS total_latency_us,
                   CAST(max(tus - prev_tus) AS BIGINT)
                     AS max_latency_us
            FROM t
            WHERE role = 'assistant' AND prev_role = 'user'
            GROUP BY conv_id
        """,
        "er_conv_dedup": f"""
            WITH t AS (
                SELECT conv_id,
                       string_agg(role || ': ' || coalesce(text, ''),
                                  chr(10) ORDER BY turn_idx) AS dialogue
                FROM read_parquet('{_oracle_corpus_path(_oracle_n())}')
                GROUP BY conv_id
            )
            SELECT min(conv_id) AS conv_id,
                   CAST(length(dialogue) AS BIGINT) AS n_dialogue_chars
            FROM t GROUP BY dialogue
        """,
        "er_sft_pairs": f"""
            WITH t AS (
                SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
                       role, coalesce(text, '') AS text,
                       role || ': ' || coalesce(text, '') AS line
                FROM read_parquet('{_oracle_corpus_path(_oracle_n())}')
            ),
            w AS (
                SELECT conv_id, turn_idx, role, text,
                       string_agg(line, chr(10)) OVER (
                           PARTITION BY conv_id ORDER BY turn_idx
                           ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
                         AS prompt
                FROM t
            )
            SELECT conv_id, turn_idx, prompt, text AS response
            FROM w WHERE role = 'assistant'
        """,
        "er_turn_context": f"""
            SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
                   string_agg(text, chr(10))
                       OVER (PARTITION BY conv_id ORDER BY turn_idx
                             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                       AS context
            FROM read_parquet('{_oracle_corpus_path(_oracle_n())}')
        """,
        "er_pairs": _er_pairs_sql(),
        "er_classified": _er_classified_sql(),
        "er_score_calibration": _er_calibration_sql(),
        "er_name_cosine": _er_name_cosine_sql(),
        "er_clusters": _er_clusters_sql(),
        "er_eval_metrics": _er_eval_sql(),
        "lineitem_agg": """
            SELECT l_returnflag, l_linestatus,
                   CAST(round(sum(l_quantity), 0) AS BIGINT) AS sum_qty,
                   CAST(round(sum(l_extendedprice), 0) AS BIGINT) AS sum_price,
                   round(sum(l_discount) / count(*), 4) AS avg_disc,
                   count(*) AS cnt
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "segment_revenue": """
            SELECT c_mktsegment,
                   CAST(round(sum(o_totalprice), 0) AS BIGINT) AS revenue,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "nation_acctbal": """
            SELECT n_name,
                   round(sum(c_acctbal) / count(*), 4) AS avg_acctbal,
                   count(*) AS n_customers
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "top_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "cust_order_totals": """
            SELECT c.c_custkey,
                   count(o.o_orderkey) AS n_orders,
                   coalesce(CAST(sum(CAST(round(o.o_totalprice * 100, 0)
                                          AS BIGINT)) AS BIGINT), 0)
                       AS total_cents
            FROM customer c
            LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey
        """,
        "cust_no_orders": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 400000.0)
        """,
        "cust_with_orders": """
            SELECT c_custkey, c_name FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 400000.0)
        """,
        "nation_revenue_q5": """
            SELECT n_name,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                       AS revenue_units
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1996-01-01'
            GROUP BY n_name
        """,
        "cust_running_revenue": """
            SELECT o_custkey, o_orderkey,
                   CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                        OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS run_cents
            FROM orders
        """,
        "high_value_click_events": """
            SELECT event_id, value FROM events
            WHERE event_type = 'click' AND value > 50.0
        """,
        "event_type_stats": """
            SELECT event_type, round(sum(value), 2) AS total_value,
                   count(*) AS n_events
            FROM events GROUP BY event_type
        """,
        # same one-pass variance identity as grouped_zscore, so the
        # float math replays exactly (round 6 absorbs sum-order ulps)
        "event_zscores": """
            WITH st AS (
              SELECT event_type, count(*) AS n, sum(value) AS s,
                     sum(value * value) AS ss
              FROM events GROUP BY event_type
            ), m AS (
              SELECT event_type, s / n AS mu,
                     sqrt(greatest(ss / n - (s / n) * (s / n), 0)) AS sd
              FROM st
            )
            SELECT e.event_id, e.event_type,
                   round(CASE WHEN m.sd > 0
                              THEN (e.value - m.mu) / m.sd
                              ELSE 0 END, 6) AS zscore
            FROM events e JOIN m USING (event_type)
        """,
        # text-format round-trips: the oracle reads the SAME exported
        # files the Ray query wrote (paths row-count-keyed, see
        # _jsonl_events_path) — this checks the read_json / read_csv
        # ingest path end to end, not just the aggregate
        # NOTE: DuckDB sum(BIGINT) yields HUGEINT which fetchdf() renders
        # as float64 — CAST back to BIGINT so the driver's strict value
        # hash compares int64 against the engine's int64 (r4 fix).
        "events_jsonl_stats": f"""
            SELECT event_type, CAST(sum(value_cents) AS BIGINT) AS total_cents,
                   count(*) AS n_events
            FROM read_json_auto(
                '{_jsonl_events_path(_table_rows(_oracle_sf_dir(),
                                                 "events"))}/*.json')
            GROUP BY event_type
        """,
        "events_jsonl_parsed": f"""
            SELECT event_type, CAST(sum(value_cents) AS BIGINT) AS total_cents,
                   count(*) AS n_events
            FROM read_json_auto(
                '{_jsonl_parsed_path(_table_rows(_oracle_sf_dir(),
                                                 "events"))}/*.json')
            GROUP BY event_type
        """,
        "events_schema_evolution": f"""
            SELECT event_type,
                   count(*) AS n_events,
                   CAST(count(value_cents) AS BIGINT) AS n_with_value,
                   CAST(coalesce(sum(value_cents), 0) AS BIGINT)
                     AS total_cents
            FROM read_parquet(
                ['{_schema_evo_path(_table_rows(_oracle_sf_dir(),
                                               "events"))}/gen1/*.parquet',
                 '{_schema_evo_path(_table_rows(_oracle_sf_dir(),
                                               "events"))}/gen2/*.parquet'],
                union_by_name = true)
            GROUP BY event_type
        """,
        "events_range_partition_stats": f"""
            SELECT count(*) AS n,
                   CAST(sum(cents) AS BIGINT) AS total_cents,
                   CAST(min(cents) AS BIGINT) AS min_cents,
                   CAST(max(cents) AS BIGINT) AS max_cents
            FROM read_parquet(
                '{_range_parts_path(_table_rows(_oracle_sf_dir(),
                                                "events"))}'
                '/bucket=1/*.parquet')
        """,
        "events_partitioned_stats": f"""
            SELECT 'click' AS event_type,
                   CAST(sum(value_cents) AS BIGINT) AS total_cents,
                   count(*) AS n_events
            FROM read_parquet(
                '{_partitioned_events_path(_table_rows(_oracle_sf_dir(),
                                                       "events"))}'
                '/event_type=click/*.parquet')
        """,
        "customer_csv_stats": f"""
            SELECT c_mktsegment,
                   CAST(sum(acctbal_cents) AS BIGINT) AS total_acctbal_cents,
                   count(*) AS n_customers
            FROM read_csv_auto(
                '{_csv_customer_path(_table_rows(_oracle_sf_dir(),
                                                 "customer"))}/*.csv')
            GROUP BY c_mktsegment
        """,
        "hourly_user_events": """
            SELECT user_id,
                   strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   count(*) AS n_events
            FROM events GROUP BY user_id, date_trunc('hour', ts)
        """,
        "distinct_event_types": """
            SELECT DISTINCT event_type FROM events
        """,
        "user_event_pivot": """
            SELECT user_id,
                   count(*) FILTER (event_type = 'click') AS click,
                   count(*) FILTER (event_type = 'error') AS error,
                   count(*) FILTER (event_type = 'purchase') AS purchase,
                   count(*) FILTER (event_type = 'signup') AS signup,
                   count(*) FILTER (event_type = 'view') AS view
            FROM events GROUP BY user_id
        """,
        "event_rollup": """
            WITH c AS (
                SELECT event_type,
                       strftime(date_trunc('hour', ts),
                                '%Y-%m-%d %H:%M:%S') AS hour,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events
            )
            SELECT coalesce(event_type, '(all)') AS event_type,
                   coalesce(hour, '(all)') AS hour,
                   count(*) AS n_events,
                   CAST(sum(cents) AS BIGINT) AS total_cents
            FROM c GROUP BY ROLLUP(event_type, hour)
        """,
        # per-column profile replay: one UNION ALL branch per column;
        # count(*) is exact BIGINT, sum(BIGINT) -> HUGEINT must be CAST
        # back (fetchdf renders HUGEINT as float64 — the r4 lesson)
        "events_profile_numeric": """
            WITH e AS (
                SELECT event_id, user_id,
                       CAST(round(value * 100) AS BIGINT) AS value_cents
                FROM events
            )
            SELECT 'event_id' AS col_name, count(*) AS n_rows,
                   count(*) - count(event_id) AS n_null,
                   CAST(min(event_id) AS DOUBLE) AS min_num,
                   CAST(max(event_id) AS DOUBLE) AS max_num,
                   CAST(sum(event_id) AS BIGINT) AS sum_int FROM e
            UNION ALL
            SELECT 'user_id', count(*), count(*) - count(user_id),
                   CAST(min(user_id) AS DOUBLE),
                   CAST(max(user_id) AS DOUBLE),
                   CAST(sum(user_id) AS BIGINT) FROM e
            UNION ALL
            SELECT 'value_cents', count(*), count(*) - count(value_cents),
                   CAST(min(value_cents) AS DOUBLE),
                   CAST(max(value_cents) AS DOUBLE),
                   CAST(sum(value_cents) AS BIGINT) FROM e
        """,
        "events_profile_strings": """
            SELECT 'event_type' AS col_name, count(*) AS n_rows,
                   count(*) - count(event_type) AS n_null,
                   min(event_type) AS min_str,
                   max(event_type) AS max_str FROM events
            UNION ALL
            SELECT 'props', count(*), count(*) - count(props),
                   min(props), max(props) FROM events
        """,
        # watermark: strict-prefix (1 PRECEDING) running max of event
        # time over the user-merged arrival order, 7-day lateness,
        # exact integer microseconds (epoch_us, never CAST(epoch()))
        "late_events": """
            WITH e AS (
              SELECT CAST(event_id AS BIGINT) AS event_id,
                     CAST(user_id AS BIGINT) AS u,
                     epoch_us(ts) AS tus
              FROM events
            ),
            w AS (
              SELECT event_id, tus,
                     max(tus) OVER (ORDER BY u, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS pmax
              FROM e
            )
            SELECT event_id,
                   CAST(greatest(coalesce(
                       pmax - CAST(604800000000 AS BIGINT) - tus, 0), 0)
                        AS BIGINT) AS late_by_us,
                   coalesce(pmax - CAST(604800000000 AS BIGINT) - tus,
                            0) > 0 AS is_late
            FROM w
        """,
        # equi-depth: quantile_disc boundaries at dyadic i/8, bucket =
        # min boundary covering the value, duplicate boundaries leave
        # later buckets absent — the exact equidepth_histogram contract
        "event_value_equidepth": """
            WITH vals AS (
              SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events
            ),
            ql AS (
              SELECT quantile_disc(v, [0.125, 0.25, 0.375, 0.5,
                                       0.625, 0.75, 0.875, 1.0]) AS l
              FROM vals
            ),
            qs AS (
              SELECT CAST(generate_subscripts(l, 1) AS BIGINT) AS bucket,
                     unnest(l) AS hi
              FROM ql
            ),
            vc AS (SELECT v, count(*) AS c FROM vals GROUP BY v),
            vb AS (
              SELECT vc.v, vc.c, min(q.bucket) AS bucket
              FROM vc JOIN qs q ON vc.v <= q.hi
              GROUP BY vc.v, vc.c
            ),
            hist AS (SELECT bucket, sum(c) AS n FROM vb GROUP BY bucket)
            SELECT h.bucket, q.hi, CAST(h.n AS BIGINT) AS n
            FROM hist h JOIN qs q USING (bucket)
        """,
        "event_value_histogram": """
            WITH c AS (
                SELECT CAST(round(value * 100) AS BIGINT) AS cents
                FROM events
            )
            SELECT cents // 1000 AS bin,
                   (cents // 1000) * 1000 AS lo,
                   (cents // 1000 + 1) * 1000 AS hi,
                   count(*) AS n
            FROM c GROUP BY 1
        """,
        "global_revenue_running": """
            WITH c AS (
                SELECT event_id, ts,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events
            )
            SELECT event_id,
                   CAST(sum(cents) OVER (
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS running_cents
            FROM c
        """,
        "event_value_outliers": """
            WITH c AS (
                SELECT event_id, event_type,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events
            ), m AS (
                SELECT event_type,
                       CAST(quantile_disc(cents, 0.5) AS BIGINT) AS med
                FROM c GROUP BY 1
            ), a AS (
                SELECT c.event_id, c.event_type, c.cents, m.med,
                       abs(c.cents - m.med) AS ad
                FROM c JOIN m USING (event_type)
            ), d AS (
                SELECT event_type,
                       CAST(quantile_disc(ad, 0.5) AS BIGINT) AS mad
                FROM a GROUP BY 1
            )
            SELECT a.event_id, a.event_type, a.cents, a.med, d.mad,
                   CAST(CASE WHEN a.ad > 3 * d.mad THEN 1 ELSE 0 END
                        AS BIGINT) AS is_outlier
            FROM a JOIN d USING (event_type)
        """,
        "hourly_top_types": """
            WITH c AS (
                SELECT strftime(date_trunc('hour', ts),
                                '%Y-%m-%d %H:%M:%S') AS hour,
                       event_type, count(*) AS n
                FROM events GROUP BY 1, 2
            )
            SELECT hour, event_type, CAST(n AS BIGINT) AS n,
                   CAST(rn AS BIGINT) AS rank
            FROM (SELECT hour, event_type, n,
                         row_number() OVER (
                             PARTITION BY hour
                             ORDER BY n DESC, event_type ASC) AS rn
                  FROM c) WHERE rn <= 2
        """,
        "new_users_per_hour": """
            WITH f AS (
                SELECT user_id, min(date_trunc('hour', ts)) AS h
                FROM events GROUP BY 1
            ), c AS (
                SELECT h, count(*) AS n_new FROM f GROUP BY 1
            )
            SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
                   CAST(n_new AS BIGINT) AS n_new,
                   CAST(sum(n_new) OVER (
                       ORDER BY h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum_users
            FROM c
        """,
        "event_value_winsorized": """
            WITH b AS (
                SELECT event_type,
                       quantile_disc(CAST(round(value * 100, 0)
                                          AS BIGINT), 0.05) AS lo,
                       quantile_disc(CAST(round(value * 100, 0)
                                          AS BIGINT), 0.95) AS hi
                FROM events GROUP BY 1
            )
            SELECT e.event_id, e.event_type,
                   CAST(round(e.value * 100, 0) AS BIGINT) AS cents,
                   least(greatest(CAST(round(e.value * 100, 0)
                                       AS BIGINT), b.lo), b.hi)
                       AS winsorized
            FROM events e JOIN b USING (event_type)
        """,
        "event_type_jaccard": """
            WITH p AS (
                SELECT DISTINCT user_id, event_type FROM events
            ),
            s AS (
                SELECT event_type, count(*) AS n FROM p GROUP BY 1
            ),
            i AS (
                SELECT a.event_type AS item_a, b.event_type AS item_b,
                       count(*) AS n_common
                FROM p a JOIN p b ON a.user_id = b.user_id
                     AND a.event_type < b.event_type
                GROUP BY 1, 2
            )
            SELECT item_a, item_b, sa.n AS n_a, sb.n AS n_b, n_common,
                   CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common)
                       AS jaccard
            FROM i JOIN s sa ON sa.event_type = item_a
                 JOIN s sb ON sb.event_type = item_b
        """,
        "user_value_window_sum": """
            SELECT user_id, event_id,
                   CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                        OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS win_cents
            FROM events
        """,
        "user_retention": """
            WITH b AS (
                SELECT DISTINCT user_id, date_trunc('hour', ts) AS h
                FROM events
            ),
            c AS (
                SELECT user_id, min(h) AS ch FROM b GROUP BY user_id
            )
            SELECT strftime(c.ch, '%Y-%m-%d %H:%M:%S') AS cohort_hour,
                   CAST(date_diff('hour', c.ch, b.h) AS BIGINT)
                       AS offset_hours,
                   count(*) AS n_users
            FROM b JOIN c USING (user_id)
            GROUP BY 1, 2
        """,
        "user_funnel": """
            WITH s1 AS (
                SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'click' GROUP BY 1
            ), s2 AS (
                SELECT e.user_id, min(e.ts) AS t2
                FROM events e JOIN s1 USING (user_id)
                WHERE e.event_type = 'signup' AND e.ts > s1.t1 GROUP BY 1
            ), s3 AS (
                SELECT e.user_id, min(e.ts) AS t3
                FROM events e JOIN s2 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
            )
            SELECT u.user_id,
                   CASE WHEN s3.user_id IS NOT NULL THEN 3
                        WHEN s2.user_id IS NOT NULL THEN 2
                        WHEN s1.user_id IS NOT NULL THEN 1
                        ELSE 0 END AS steps_completed
            FROM (SELECT DISTINCT user_id FROM events) u
            LEFT JOIN s1 USING (user_id)
            LEFT JOIN s2 USING (user_id)
            LEFT JOIN s3 USING (user_id)
        """,
        "hourly_distinct_users": """
            SELECT strftime(date_trunc('hour', ts),
                            '%Y-%m-%d %H:%M:%S') AS hour,
                   count(DISTINCT user_id) AS n_distinct
            FROM events GROUP BY 1
        """,
        "user_event_entropy": """
            WITH c AS (
                SELECT user_id, event_type, count(*) AS n
                FROM events GROUP BY 1, 2
            ), t AS (
                SELECT user_id, sum(n) AS tot FROM c GROUP BY 1
            )
            SELECT c.user_id,
                   round(-sum((n / CAST(tot AS DOUBLE))
                              * ln(n / CAST(tot AS DOUBLE))), 6)
                       AS entropy
            FROM c JOIN t USING (user_id)
            GROUP BY c.user_id
        """,
        "user_top_event_type": """
            SELECT user_id, event_type AS mode_value, n FROM (
                SELECT user_id, event_type, count(*) AS n,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY count(*) DESC, event_type ASC) AS rn
                FROM events GROUP BY user_id, event_type
            ) WHERE rn = 1
        """,
        "exact_dedup_docs": """
            SELECT text, min(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        # keep-best replay: same ws-norm + lower key, the representative
        # is the row_number()=1 row ordered (n_chars DESC, doc_id)
        "doc_dedup_keep_best": rf"""
            WITH n AS (
                SELECT doc_id, n_chars,
                       lower(array_to_string(regexp_split_to_array(
                           trim({_WS_NORM_TEXT},
                                ' ' || chr(9) || chr(10) || chr(12)
                                || chr(13)),
                           '\s+'), ' ')) AS norm_text
                FROM documents
            )
            SELECT norm_text, CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(n_dups AS BIGINT) AS n_dups
            FROM (SELECT norm_text, doc_id, n_chars,
                         row_number() OVER (
                             PARTITION BY norm_text
                             ORDER BY n_chars DESC, doc_id) AS rn,
                         count(*) OVER (PARTITION BY norm_text) AS n_dups
                  FROM n)
            WHERE rn = 1
        """,
        "corpus_diff": """
            WITH a AS (
                SELECT doc_id, md5(coalesce(text, '')) AS h
                FROM documents
            ),
            bsrc AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 17 = 0 THEN upper(text)
                            ELSE text END AS text
                FROM documents WHERE doc_id % 23 <> 0
                UNION ALL
                SELECT doc_id + 1000000,
                       'new document ' || CAST(doc_id + 1000000 AS VARCHAR)
                FROM documents WHERE doc_id % 29 = 0
            ),
            b AS (SELECT doc_id, md5(coalesce(text, '')) AS h FROM bsrc)
            SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                   CASE WHEN a.doc_id IS NULL THEN 'added'
                        WHEN b.doc_id IS NULL THEN 'removed'
                        WHEN a.h <> b.h THEN 'changed'
                        ELSE 'same' END AS status
            FROM a FULL JOIN b ON a.doc_id = b.doc_id
        """,
        # CDC MERGE INTO: the highest-LSN (o_orderkey) change per
        # customer wins; winning delete removes the row, winning upsert
        # replaces the payload; untouched customers keep last_seq 0
        "customer_cdc_merged": """
            WITH ch AS (
              SELECT o_custkey AS c_custkey,
                     CAST(o_orderkey AS BIGINT) AS seq,
                     CASE WHEN o_orderkey % 10 = 0 THEN 'delete'
                          ELSE 'upsert' END AS op,
                     CAST(round(o_totalprice * 100) AS BIGINT)
                       AS acctbal_cents,
                     'UPDATED' AS c_mktsegment
              FROM orders
            ),
            latest AS (
              SELECT * FROM (
                SELECT ch.*, row_number() OVER (
                  PARTITION BY c_custkey ORDER BY seq DESC) AS rn
                FROM ch)
              WHERE rn = 1
            ),
            base AS (
              SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
                     CAST(round(c_acctbal * 100) AS BIGINT)
                       AS acctbal_cents,
                     c_mktsegment
              FROM customer
            )
            SELECT coalesce(b.c_custkey, l.c_custkey) AS c_custkey,
                   CASE WHEN l.op IS NOT NULL THEN l.acctbal_cents
                        ELSE b.acctbal_cents END AS acctbal_cents,
                   CASE WHEN l.op IS NOT NULL THEN l.c_mktsegment
                        ELSE b.c_mktsegment END AS c_mktsegment,
                   CAST(coalesce(l.seq, 0) AS BIGINT) AS last_seq
            FROM base b FULL JOIN latest l USING (c_custkey)
            WHERE l.op IS NULL OR l.op <> 'delete'
        """,
        # id-ordered increments make streaming first-seen == global min
        "exact_dedup_incremental": """
            SELECT text, min(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        # tokenization reads through the whitespace normalization
        # (ops/text.ws_normalize_sql) and trims the exact Python-strip
        # charset, so C0/Unicode-space inputs count identically in RE2
        # and Python re
        "bpe_learned_merges": _bpe_train_sql(8),
        "bpe_token_histogram": _bpe_histogram_sql(),
        "doc_token_ids": _bpe_encode_sql(),
        # token-window chunking: same whitespace tokenize as
        # doc_token_counts; chunk text re-joined with single spaces
        # (list_slice bounds are INCLUSIVE; starts step by the stride)
        "doc_chunks": rf"""
            WITH t AS (
                SELECT doc_id,
                       trim({_WS_NORM_TEXT},
                            ' ' || chr(9) || chr(10) || chr(12) || chr(13)
                       ) AS txt
                FROM documents
            ),
            tok AS (
                SELECT doc_id, regexp_split_to_array(txt, '\s+') AS toks,
                       CASE WHEN length(txt) = 0 THEN 0
                            ELSE array_length(
                                regexp_split_to_array(txt, '\s+'))
                       END AS n
                FROM t
            ),
            ch AS (
                SELECT doc_id, toks, n,
                       unnest(generate_series(1, n, 24)) AS s
                FROM tok WHERE n > 0
            )
            SELECT doc_id,
                   CAST((s - 1) // 24 AS BIGINT) AS chunk_idx,
                   array_to_string(
                       list_slice(toks, s, least(s + 31, n)), ' ')
                       AS chunk_text,
                   CAST(least(s + 31, n) - s + 1 AS BIGINT) AS n_tokens
            FROM ch
        """,
        # data-mixing weights: same whitespace-token contract as
        # doc_token_counts; share and weight are round(x, 6) of the
        # identical double quotients the Ray side rounds
        "source_mixture": rf"""
            WITH t AS (
                SELECT source,
                       trim({_WS_NORM_TEXT},
                            ' ' || chr(9) || chr(10) || chr(12) || chr(13)
                       ) AS txt
                FROM documents
            ),
            s AS (
                SELECT source, count(*) AS n_docs,
                       sum(CASE WHEN length(txt) = 0 THEN 0
                                ELSE array_length(
                                    regexp_split_to_array(txt, '\s+'))
                           END) AS n_tokens
                FROM t GROUP BY source
            ),
            tot AS (
                SELECT CAST(sum(n_tokens) AS DOUBLE) AS T,
                       count(*) AS ns
                FROM s
            )
            SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
                   round(CAST(n_tokens AS DOUBLE) / T, 6) AS token_share,
                   round((1.0 / ns) / (CAST(n_tokens AS DOUBLE) / T), 6)
                       AS weight
            FROM s, tot
        """,
        "doc_token_counts": rf"""
            WITH t AS (
                SELECT doc_id,
                       trim({_WS_NORM_TEXT},
                            ' ' || chr(9) || chr(10) || chr(12) || chr(13)
                       ) AS txt
                FROM documents
            )
            SELECT doc_id,
                   CASE WHEN length(txt) = 0 THEN 0
                        ELSE array_length(regexp_split_to_array(txt, '\s+'))
                   END AS n_tokens,
                   array_length(regexp_extract_all(
                        txt, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+')) AS n_bpe_tokens,
                   {_bpe_merged_sql_expr("txt")} AS n_bpe_merged_tokens
            FROM t
        """,
        # boilerplate-line removal over deterministic 4-word lines:
        # chunks shared by >= 3 distinct docs are dropped, survivors
        # rejoin by \n in order (ops/dedup.common_line_dedup semantics)
        "doc_line_dedup": r"""
            WITH w AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(
                         lower(coalesce(text, '')), '[a-z0-9]+')) AS w,
                     generate_subscripts(regexp_extract_all(
                         lower(coalesce(text, '')), '[a-z0-9]+'), 1) AS i
              FROM documents
            ),
            chunk AS (
              SELECT doc_id, (i - 1) // 4 AS c,
                     string_agg(w, ' ' ORDER BY i) AS line
              FROM w GROUP BY doc_id, (i - 1) // 4
            ),
            common AS (
              SELECT line FROM chunk
              GROUP BY line HAVING count(DISTINCT doc_id) >= 3
            )
            SELECT d.doc_id,
                   coalesce((SELECT string_agg(ch.line, chr(10)
                                               ORDER BY ch.c)
                             FROM chunk ch
                             WHERE ch.doc_id = d.doc_id
                               AND ch.line NOT IN
                                   (SELECT line FROM common)), '')
                       AS clean_text
            FROM documents d
        """,
        # Gopher-style repetition: the fractions are single float64
        # expressions (1 - distinct/total) over exact integer counts,
        # identical to ops/text.repetition_batch
        "doc_repetition": r"""
            WITH l AS (
              SELECT doc_id,
                     trim(unnest(regexp_split_to_array(
                          coalesce(text, ''), '\n')),
                          ' ' || chr(9) || chr(13)) AS line
              FROM documents
            ),
            lc AS (
              SELECT doc_id, count(*) AS t, count(DISTINCT line) AS d
              FROM l WHERE line <> '' GROUP BY doc_id
            ),
            w AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(
                         lower(coalesce(text, '')), '[a-z0-9]+')) AS w,
                     generate_subscripts(regexp_extract_all(
                         lower(coalesce(text, '')), '[a-z0-9]+'), 1) AS i
              FROM documents
            ),
            tri AS (
              SELECT doc_id,
                     w || ' ' || lead(w, 1) OVER win
                       || ' ' || lead(w, 2) OVER win AS t3,
                     lead(w, 2) OVER win AS ok
              FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY i)
            ),
            tc AS (
              SELECT doc_id, count(*) AS t, count(DISTINCT t3) AS d
              FROM tri WHERE ok IS NOT NULL GROUP BY doc_id
            )
            SELECT d0.doc_id,
                   round(CASE WHEN lc.t > 0
                              THEN 1 - CAST(lc.d AS DOUBLE) / lc.t
                              ELSE 0 END, 6) AS dup_line_frac,
                   round(CASE WHEN tc.t > 0
                              THEN 1 - CAST(tc.d AS DOUBLE) / tc.t
                              ELSE 0 END, 6) AS dup_trigram_frac
            FROM documents d0
            LEFT JOIN lc USING (doc_id)
            LEFT JOIN tc USING (doc_id)
        """,
        # NFC + control strip + ws-disagree fold + \s+ collapse + trim
        # + 200-codepoint substr, trailing cut-space rtrimmed — the
        # exact step order of ops/text.clean_text
        "doc_clean": rf"""
            WITH c AS (
              SELECT doc_id,
                     rtrim(substr(
                       trim(regexp_replace(
                         regexp_replace(
                           regexp_replace(
                             nfc_normalize(coalesce(text, '')),
                             '{{CTRL}}', ' ', 'g'),
                           '{{WSD}}', ' ', 'g'),
                         '\s+', ' ', 'g')),
                       1, 200), ' ') AS clean_text
              FROM documents
            )
            SELECT doc_id, clean_text,
                   CAST(length(clean_text) AS BIGINT) AS n_chars
            FROM c
        """.replace("{{CTRL}}", CTRL_SQL_CLASS)
           .replace("{{WSD}}", WS_DISAGREE_SQL_CLASS),
        "doc_quality": r"""
            SELECT doc_id,
                   length(text) AS n_chars_text,
                   length(regexp_replace(text, '[\w\s]', '', 'g'))
                       / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
                   length(regexp_replace(text, '[^0-9]', '', 'g'))
                       / CAST(greatest(length(text), 1) AS DOUBLE) AS digit_ratio,
                   length(regexp_replace(text, '[^A-Z]', '', 'g'))
                       / CAST(greatest(length(text), 1) AS DOUBLE) AS upper_ratio
            FROM documents
        """,
        "doc_pii_scrub": r"""
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(coalesce(text, ''),
                         '[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+',
                         '<EMAIL>', 'g'),
                       '\b[0-9]{9,}\b', '<ID>', 'g'),
                     '\+?[0-9][0-9 ()-]{7,}[0-9]', '<PHONE>', 'g')
                     AS clean_text
            FROM documents
        """,
        "media_meta": """
            SELECT media_id, mime,
                   CAST(octet_length(payload) AS BIGINT) AS n_bytes,
                   hex(payload) AS payload_hex,
                   CAST(width AS BIGINT) AS width,
                   CAST(height AS BIGINT) AS height
            FROM read_parquet('/tmp/er_media/media.parquet')
        """,
        "doc_top_terms": """
            SELECT word, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(regexp_extract_all(
                      lower(coalesce(text, '')), '[a-z0-9]+')) AS word
                  FROM documents)
            GROUP BY word
            ORDER BY cnt DESC, word
            LIMIT 50
        """,
        "doc_tfidf_top5": """
            WITH tok AS (
              SELECT doc_id, unnest(regexp_extract_all(
                         lower(coalesce(text, '')), '[a-z0-9]+')) AS word
              FROM documents
            ),
            tf AS (SELECT doc_id, word, count(*) AS tf
                   FROM tok GROUP BY doc_id, word),
            dfreq AS (SELECT word, count(DISTINCT doc_id) AS df
                      FROM tok GROUP BY word),
            n AS (SELECT count(*) AS n FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.word,
                     CAST(tf.tf AS DOUBLE)
                         * ln(CAST(n.n AS DOUBLE) / CAST(dfreq.df AS DOUBLE))
                         AS score
              FROM tf JOIN dfreq USING (word), n
            ),
            ranked AS (
              SELECT doc_id, word, score,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, word) AS r
              FROM scored
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id, word,
                   round(score, 6) AS score
            FROM ranked WHERE r <= 5
        """,
        "source_char_budget_sample": """
            WITH h AS (
                SELECT source, doc_id, n_chars,
                       (doc_id * 2654435761) % 4294967296 AS hh
                FROM documents
            ), c AS (
                SELECT source, doc_id, n_chars,
                       sum(n_chars) OVER (
                           PARTITION BY source ORDER BY hh, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum
                FROM h
            )
            SELECT source, CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(cum AS BIGINT) AS cum_n_chars
            FROM c WHERE cum <= 4000
        """,
        "doc_hash_split": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CASE WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 20
                        THEN 'test' ELSE 'train' END AS split
            FROM documents
        """,
        "doc_lm_score": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(
                         lower(coalesce(text, '')), '[a-z0-9]+')) AS w,
                     generate_subscripts(regexp_extract_all(
                         lower(coalesce(text, '')), '[a-z0-9]+'), 1) AS i
              FROM documents
            ),
            bg AS (
              SELECT doc_id, w AS w1,
                     lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
              FROM toks
              QUALIFY w2 IS NOT NULL
            ),
            bc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
            cc AS (SELECT w1, sum(c12) AS c1 FROM bc GROUP BY w1),
            vv AS (SELECT count(*) AS v FROM
                   (SELECT w1 AS w FROM bc UNION SELECT w2 FROM bc))
            SELECT CAST(g.doc_id AS BIGINT) AS doc_id,
                   count(*) AS n_bigrams,
                   round(avg(ln((bc.c12 + 1.0) / (cc.c1 + vv.v))), 6)
                       AS avg_logp
            FROM bg g
            JOIN bc ON g.w1 = bc.w1 AND g.w2 = bc.w2
            JOIN cc ON g.w1 = cc.w1, vv
            GROUP BY g.doc_id
        """,
        "doc_collocations": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(
                         lower(coalesce(text, '')), '[a-z0-9]+')) AS w,
                     generate_subscripts(regexp_extract_all(
                         lower(coalesce(text, '')), '[a-z0-9]+'), 1) AS i
              FROM documents
            ),
            bg AS (
              SELECT doc_id, w AS w1,
                     lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
              FROM toks
              QUALIFY w2 IS NOT NULL
            ),
            bc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
            c1 AS (SELECT w1, sum(c12) AS c1 FROM bc GROUP BY w1),
            c2 AS (SELECT w2, sum(c12) AS c2 FROM bc GROUP BY w2),
            t AS (SELECT CAST(sum(c12) AS DOUBLE) AS t FROM bc)
            SELECT w1, w2, CAST(c12 AS BIGINT) AS cnt,
                   round(ln((CAST(c12 AS DOUBLE) * t.t)
                            / (CAST(c1.c1 AS DOUBLE) * c2.c2)), 6) AS pmi
            FROM bc JOIN c1 USING (w1) JOIN c2 USING (w2), t
            WHERE c12 >= 5
            ORDER BY pmi DESC, w1, w2 LIMIT 50
        """,
        "doc_stratified_sample": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
                   CAST(r AS BIGINT) AS sample_rank
            FROM (SELECT doc_id, lang,
                         row_number() OVER (
                             PARTITION BY lang
                             ORDER BY (doc_id * 2654435761) % 4294967296,
                                      doc_id) AS r
                  FROM documents)
            WHERE r <= 25
        """,
        "doc_pack_texts": """
            WITH h AS (
              SELECT doc_id, coalesce(text, '') AS text,
                     (doc_id * 2654435761) % 4294967296 AS h
              FROM documents
            ), s AS (
              SELECT h % 8 AS shard,
                     string_agg(text, '' ORDER BY h, doc_id) AS stream
              FROM h GROUP BY h % 8
            )
            SELECT CAST(shard AS BIGINT) AS shard,
                   CAST(i AS BIGINT) AS seq_id,
                   substring(stream, CAST(i * 512 + 1 AS BIGINT), 512)
                       AS seq_text
            FROM s, unnest(range(CAST(ceil(length(stream) / 512.0)
                                      AS BIGINT))) AS t(i)
        """,
        # mixture APPLICATION: the source_mixture weight table as an
        # integer acceptance prob (scale == resolution == 1e6, so the
        # weighted_sample rule reduces to hash % 1e6 < w_int)
        "mixture_resampled": rf"""
            WITH t AS (
                SELECT doc_id, source,
                       trim({_WS_NORM_TEXT},
                            ' ' || chr(9) || chr(10) || chr(12) || chr(13)
                       ) AS txt
                FROM documents
            ),
            s AS (
                SELECT source,
                       sum(CASE WHEN length(txt) = 0 THEN 0
                                ELSE array_length(
                                    regexp_split_to_array(txt, '\s+'))
                           END) AS n_tokens
                FROM t GROUP BY source
            ),
            tot AS (
                SELECT CAST(sum(n_tokens) AS DOUBLE) AS T,
                       count(*) AS ns
                FROM s
            ),
            w AS (
                SELECT source,
                       CAST(round(round((1.0 / ns)
                                / (CAST(n_tokens AS DOUBLE) / T), 6)
                             * 1000000) AS BIGINT) AS w_int
                FROM s, tot
            )
            SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.source
            FROM documents d JOIN w USING (source)
            WHERE ((d.doc_id * 2654435761) % 4294967296) % 1000000
                  < w.w_int
        """,
        "doc_weighted_sample": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_chars AS BIGINT) AS n_chars
            FROM documents
            WHERE (((doc_id * 2654435761) % 4294967296) % 1000000) * 2000
                  < n_chars * 1000000
        """,
        "doc_shuffle_index": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(h % 8 AS BIGINT) AS shard,
                   CAST(row_number() OVER (
                        PARTITION BY h % 8 ORDER BY h, doc_id) - 1
                        AS BIGINT) AS pos
            FROM (SELECT doc_id,
                         (doc_id * 2654435761) % 4294967296 AS h
                  FROM documents)
        """,
        "doc_pack": """
            WITH h AS (
              SELECT doc_id, n_chars,
                     (doc_id * 2654435761) % 4294967296 AS h
              FROM documents
            ), c AS (
              SELECT doc_id, h % 8 AS shard,
                     SUM(n_chars) OVER (
                         PARTITION BY h % 8 ORDER BY h, doc_id
                         ROWS UNBOUNDED PRECEDING) - n_chars AS start_off
              FROM h
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(shard AS BIGINT) AS shard,
                   CAST(start_off // 2048 AS BIGINT) AS seq_id,
                   CAST(start_off % 2048 AS BIGINT) AS seq_offset
            FROM c
        """,
        "incremental_event_counts": """
            SELECT event_type, count(*) AS n_events,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS total_cents
            FROM events GROUP BY event_type
        """,
        "fk_orphans": """
            SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
                   count(*) AS n_orphans
            FROM lineitem WHERE NOT EXISTS (
                SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
            UNION ALL
            SELECT 'orders.o_custkey->customer', count(*)
            FROM orders WHERE NOT EXISTS (
                SELECT 1 FROM customer WHERE c_custkey = o_custkey)
            UNION ALL
            SELECT 'customer.c_nationkey->nation', count(*)
            FROM customer WHERE NOT EXISTS (
                SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)
            UNION ALL
            SELECT 'events.user_id->customer', count(*)
            FROM events WHERE NOT EXISTS (
                SELECT 1 FROM customer WHERE c_custkey = user_id)
        """,
        "user_value_intervals": """
            SELECT event_id, user_id,
                   CAST(round(value * 100) AS BIGINT) AS value_cents,
                   strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_start,
                   strftime(lead(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id),
                            '%Y-%m-%d %H:%M:%S.%f') AS ts_end
            FROM events
        """,
        "event_type_drift": """
            WITH a AS (SELECT event_type, count(*) AS n_a
                       FROM events WHERE event_id % 2 = 0 GROUP BY 1),
                 b AS (SELECT event_type, count(*) AS n_b
                       FROM events WHERE event_id % 2 = 1 GROUP BY 1),
                 t AS (SELECT a.event_type, n_a, n_b
                       FROM a JOIN b USING (event_type)),
                 tot AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM t)
            SELECT event_type, n_a, n_b,
                   round((n_a / CAST(ta AS DOUBLE)
                          - n_b / CAST(tb AS DOUBLE))
                         * ln((n_a / CAST(ta AS DOUBLE))
                              / (n_b / CAST(tb AS DOUBLE))), 6)
                       AS psi_term
            FROM t, tot
        """,
        "user_busy_intervals": """
            WITH iv AS (
                SELECT user_id, epoch_us(ts) AS st,
                       epoch_us(ts) + 600000000 AS en
                FROM events
            ), o AS (
                SELECT user_id, st, en,
                       CASE WHEN st <= max(en) OVER (
                                PARTITION BY user_id ORDER BY st, en
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING)
                            THEN 0 ELSE 1 END AS brk
                FROM iv
            ), isl AS (
                SELECT user_id, st, en,
                       SUM(brk) OVER (PARTITION BY user_id
                                      ORDER BY st, en
                                      ROWS UNBOUNDED PRECEDING)
                           AS island
                FROM o
            )
            SELECT user_id, min(st) AS island_start,
                   max(en) AS island_end, count(*) AS n_merged
            FROM isl GROUP BY user_id, island
        """,
        "session_type_lift": """
            WITH o AS (
              SELECT event_id, user_id, ts, event_type,
                     CASE WHEN ts - lag(ts) OVER (
                              PARTITION BY user_id ORDER BY ts, event_id)
                              > INTERVAL 1800 SECOND
                          THEN 1 ELSE 0 END AS brk
              FROM events
            ), s AS (
              SELECT event_type,
                     CAST(user_id AS VARCHAR) || ':' ||
                     CAST(SUM(brk) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS VARCHAR)
                         AS session_id
              FROM o
            ), d AS (SELECT DISTINCT session_id, event_type FROM s),
            tot AS (SELECT count(DISTINCT session_id) AS ns FROM d),
            sup1 AS (SELECT event_type, count(*) AS sup
                     FROM d GROUP BY 1),
            pairs AS (
              SELECT d1.event_type AS type_a, d2.event_type AS type_b,
                     count(*) AS support
              FROM d d1 JOIN d d2 ON d1.session_id = d2.session_id
                                 AND d1.event_type < d2.event_type
              GROUP BY 1, 2
            )
            SELECT p.type_a, p.type_b, p.support,
                   CAST(p.support * tot.ns AS DOUBLE)
                     / CAST(a.sup * b.sup AS DOUBLE) AS lift
            FROM pairs p
            CROSS JOIN tot
            JOIN sup1 a ON a.event_type = p.type_a
            JOIN sup1 b ON b.event_type = p.type_b
        """,
        "event_sessions": """
            WITH o AS (
              SELECT event_id, user_id, ts,
                     CASE WHEN ts - lag(ts) OVER (
                              PARTITION BY user_id ORDER BY ts, event_id)
                              > INTERVAL 1800 SECOND
                          THEN 1 ELSE 0 END AS brk
              FROM events
            )
            SELECT event_id, user_id,
                   CAST(user_id AS VARCHAR) || ':' ||
                   CAST(SUM(brk) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS session_id
            FROM o
        """,
        # ECDF against the click reference: count of clicks <= value
        # over the click total, exact ints in the quotient
        "purchase_value_ecdf": """
            WITH p AS (
              SELECT CAST(event_id AS BIGINT) AS event_id,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events WHERE event_type = 'purchase'
            ),
            c AS (SELECT CAST(round(value * 100) AS BIGINT) AS v
                  FROM events WHERE event_type = 'click'),
            nb AS (SELECT count(*) AS n FROM c)
            SELECT p.event_id, p.cents,
                   round(CAST((SELECT count(*) FROM c
                               WHERE c.v <= p.cents) AS DOUBLE)
                         / (SELECT n FROM nb), 6) AS ecdf
            FROM p
        """,
        # Gini by the sorted-scan identity; integer rank-weighted sums
        # (tie order cancels), one exact double division
        "event_type_gini": """
            WITH e AS (
              SELECT event_type,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events
            ),
            r AS (
              SELECT event_type, v,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY v) AS i
              FROM e
            ),
            a AS (
              SELECT event_type, count(*) AS n,
                     CAST(sum(v) AS BIGINT) AS sx,
                     CAST(sum(i * v) AS BIGINT) AS six
              FROM r GROUP BY event_type
            )
            SELECT event_type, n,
                   CASE WHEN sx = 0 THEN 0.0
                        ELSE round(CAST(2 * six - (n + 1) * sx AS DOUBLE)
                                   / CAST(n * sx AS DOUBLE), 6)
                   END AS gini
            FROM a
        """,
        # exact two-sample KS: merged distinct-value CDFs, sup-norm
        # with the smallest attaining value (ties in the double diff
        # resolve identically — both sides divide the same exact ints)
        "event_value_ks": """
            WITH a AS (SELECT CAST(round(value * 100) AS BIGINT) AS v
                       FROM events WHERE event_type = 'click'),
            b AS (SELECT CAST(round(value * 100) AS BIGINT) AS v
                  FROM events WHERE event_type = 'purchase'),
            ca AS (SELECT v, count(*) AS c FROM a GROUP BY v),
            cb AS (SELECT v, count(*) AS c FROM b GROUP BY v),
            vals AS (SELECT v FROM ca UNION SELECT v FROM cb),
            cdf AS (
              SELECT vals.v,
                     CAST(sum(coalesce(ca.c, 0))
                          OVER (ORDER BY vals.v) AS BIGINT) AS cum_a,
                     CAST(sum(coalesce(cb.c, 0))
                          OVER (ORDER BY vals.v) AS BIGINT) AS cum_b
              FROM vals LEFT JOIN ca ON ca.v = vals.v
                        LEFT JOIN cb ON cb.v = vals.v
            ),
            tot AS (SELECT (SELECT count(*) FROM a) AS na,
                           (SELECT count(*) FROM b) AS nb),
            d AS (
              SELECT v,
                     abs(CAST(cum_a AS DOUBLE) / (SELECT na FROM tot)
                         - CAST(cum_b AS DOUBLE) / (SELECT nb FROM tot))
                       AS diff
              FROM cdf
            )
            SELECT round((SELECT max(diff) FROM d), 6) AS ks,
                   (SELECT min(v) FROM d
                    WHERE diff = (SELECT max(diff) FROM d)) AS at_value,
                   (SELECT na FROM tot) AS n_a,
                   (SELECT nb FROM tot) AS n_b
        """,
        "event_type_share": """
            WITH s AS (
              SELECT event_type,
                     CAST(sum(CAST(round(value * 100) AS BIGINT))
                          AS BIGINT) AS total_cents
              FROM events GROUP BY event_type
            ),
            g AS (SELECT CAST(sum(total_cents) AS BIGINT) AS t FROM s)
            SELECT event_type, total_cents,
                   round(CAST(total_cents AS DOUBLE)
                         / (SELECT CAST(t AS DOUBLE) FROM g), 6) AS share
            FROM s
        """,
        "sliding_user_counts": """
            SELECT strftime(make_timestamp((b - off) * 900000000),
                            '%Y-%m-%d %H:%M:%S') AS window_start,
                   count(DISTINCT user_id) AS n_users
            FROM (SELECT epoch_us(ts) // 900000000 AS b, user_id
                  FROM events),
                 (SELECT unnest([0, 1, 2, 3]) AS off)
            GROUP BY 1
        """,
        "sliding_event_counts": """
            SELECT strftime(make_timestamp((b - off) * 900000000),
                            '%Y-%m-%d %H:%M:%S') AS window_start,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM (SELECT epoch_us(ts) // 900000000 AS b, value FROM events),
                 (SELECT unnest([0, 1, 2, 3]) AS off)
            GROUP BY 1
        """,
        "orders_asof": """
            SELECT event_id, user_id, o_orderkey AS last_order_key,
                   o_totalprice AS last_order_price
            FROM (
              SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
                     row_number() OVER (
                         PARTITION BY e.event_id
                         ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
              FROM events e
              JOIN orders o ON o.o_custkey = e.user_id
                           AND o.o_orderdate <= e.ts)
            WHERE rn = 1
        """,
        "lineitem_ship_window": """
            SELECT l.l_orderkey, l.l_linenumber, o.o_totalprice
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
             AND l.l_shipdate >= o.o_orderdate
             AND l.l_shipdate <= o.o_orderdate + INTERVAL 60 DAY
        """,
        "cust_top_orders": """
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (
                        PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT)
                       AS rank
            FROM orders
            QUALIFY rank <= 3
        """,
        "price_quantiles_cont": """
            -- replay of grouped_quantiles_cont's exact interpolation
            -- (NOT DuckDB's quantile_cont internals): v[floor(pos)]
            -- + (v[ceil(pos)] - v[floor(pos)]) * frac at pos = q*(n-1)
            WITH ranked AS (
                SELECT l_returnflag AS k, l_extendedprice AS v,
                       row_number() OVER (PARTITION BY l_returnflag
                                          ORDER BY l_extendedprice) - 1 AS r,
                       count(*) OVER (PARTITION BY l_returnflag) AS n
                FROM lineitem
            ), qq AS (SELECT unnest([0.5e0, 0.9e0, 0.99e0]) AS q)
            SELECT k AS l_returnflag, q,
                   max(CASE WHEN r = CAST(floor(q * (n-1)) AS BIGINT)
                       THEN CAST(v AS DOUBLE) END)
                   + (max(CASE WHEN r = CAST(ceil(q * (n-1)) AS BIGINT)
                          THEN CAST(v AS DOUBLE) END)
                      - max(CASE WHEN r = CAST(floor(q * (n-1)) AS BIGINT)
                            THEN CAST(v AS DOUBLE) END))
                     * (q * (any_value(n)-1) - floor(q * (any_value(n)-1)))
                     AS value
            FROM ranked, qq GROUP BY k, q
        """,
        "cust_pareto": """
            WITH t AS (
                SELECT c.c_custkey,
                       CAST(round(c.c_acctbal * 100) AS BIGINT)
                           AS acctbal_cents,
                       count(o.o_orderkey) AS n_orders
                FROM customer c
                LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                GROUP BY 1, 2
            )
            SELECT c_custkey, acctbal_cents, n_orders
            FROM t x
            WHERE NOT EXISTS (
                SELECT 1 FROM t y
                WHERE y.acctbal_cents >= x.acctbal_cents
                  AND y.n_orders >= x.n_orders
                  AND (y.acctbal_cents > x.acctbal_cents
                       OR y.n_orders > x.n_orders))
        """,
        "hourly_value_ohlc": """
            WITH t AS (
                SELECT event_type,
                       strftime(date_trunc('hour', ts),
                                '%Y-%m-%d %H:%M:%S') AS hour,
                       CAST(round(value * 100) AS BIGINT) AS v,
                       row_number() OVER (PARTITION BY event_type,
                           date_trunc('hour', ts)
                           ORDER BY ts, event_id) AS rn_a,
                       row_number() OVER (PARTITION BY event_type,
                           date_trunc('hour', ts)
                           ORDER BY ts DESC, event_id DESC) AS rn_d
                FROM events
            )
            SELECT event_type, hour,
                   max(CASE WHEN rn_a = 1 THEN v END) AS open,
                   max(v) AS high, min(v) AS low,
                   max(CASE WHEN rn_d = 1 THEN v END) AS close
            FROM t GROUP BY event_type, hour
        """,
        "event_hour_value_corr": """
            WITH t AS (
                SELECT event_type,
                       CAST(hour(ts) AS BIGINT) AS x,
                       CAST(round(value * 100) AS BIGINT) AS y
                FROM events
            ), s AS (
                SELECT event_type, count(*) AS n,
                       sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
                       sum(y*y) AS syy, sum(x*y) AS sxy
                FROM t GROUP BY 1
            )
            SELECT event_type,
                   CAST(n*sxy - sx*sy AS DOUBLE)
                     / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                            * CAST(n*syy - sy*sy AS DOUBLE)) AS corr
            FROM s
        """,
        "price_quantiles": """
            SELECT l_returnflag, 0.5 AS q,
                   quantile_disc(l_extendedprice, 0.5) AS value
            FROM lineitem GROUP BY 1
            UNION ALL
            SELECT l_returnflag, 0.9,
                   quantile_disc(l_extendedprice, 0.9)
            FROM lineitem GROUP BY 1
            UNION ALL
            SELECT l_returnflag, 0.99,
                   quantile_disc(l_extendedprice, 0.99)
            FROM lineitem GROUP BY 1
        """,
        # hashing trick: '<col>:<value>' tokens through the polynomial
        # string hash (the hash_bucket contract) mod 64, collision fold
        "event_feature_hash": f"""
            WITH f AS (
              SELECT CAST(event_id AS BIGINT) AS event_id,
                     unnest(['event_type:' || event_type,
                             'user_id:' || CAST(user_id AS VARCHAR)])
                       AS tok
              FROM events
            )
            SELECT event_id,
                   CAST({_poly_hash_sql("tok")} % 64 AS BIGINT)
                     AS feature_idx,
                   count(*) AS n
            FROM f GROUP BY 1, 2
        """,
        # group-mean imputation: NULL mask = error events; per-user
        # rounded mean of non-null cents, global mean fallback; the
        # HUGEINT sum casts to DOUBLE before the divide so both sides
        # compute the identical IEEE quotient
        "event_value_imputed": """
            WITH e AS (
              SELECT CAST(event_id AS BIGINT) AS event_id,
                     CAST(user_id AS BIGINT) AS u,
                     CASE WHEN event_type = 'error' THEN NULL
                          ELSE CAST(round(value * 100) AS BIGINT)
                     END AS cents
              FROM events
            ),
            um AS (
              SELECT u, CAST(round(CAST(sum(cents) AS DOUBLE)
                                   / count(cents)) AS BIGINT) AS m
              FROM e WHERE cents IS NOT NULL GROUP BY u
            ),
            g AS (
              SELECT CAST(round(CAST(sum(cents) AS DOUBLE)
                                / count(cents)) AS BIGINT) AS m
              FROM e WHERE cents IS NOT NULL
            )
            SELECT e.event_id,
                   coalesce(e.cents, um.m, (SELECT m FROM g))
                     AS value_cents,
                   e.cents IS NULL AS was_imputed
            FROM e LEFT JOIN um USING (u)
        """,
        "purchase_click_window": """
            SELECT CAST(p.event_id AS BIGINT) AS p_eid,
                   CAST(c.event_id AS BIGINT) AS c_eid,
                   CAST(abs(epoch_us(p.ts) - epoch_us(c.ts)) AS BIGINT)
                     AS gap_us
            FROM events p JOIN events c ON p.user_id = c.user_id
            WHERE p.event_type = 'purchase' AND c.event_type = 'click'
              AND abs(epoch_us(p.ts) - epoch_us(c.ts))
                  <= CAST(21600000000 AS BIGINT)
        """,
        "user_first_last_event": """
            WITH e AS (
              SELECT CAST(user_id AS BIGINT) AS user_id,
                     CAST(event_id AS BIGINT) AS eid,
                     epoch_us(ts) AS tus, value
              FROM events
            ),
            r AS (
              SELECT *,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY tus, eid) AS rn,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY tus DESC, eid DESC) AS rd
              FROM e
            )
            SELECT a.user_id,
                   a.tus AS first_tus, a.value AS first_value,
                   b.tus AS last_tus, b.value AS last_value
            FROM (SELECT * FROM r WHERE rn = 1) a
            JOIN (SELECT * FROM r WHERE rd = 1) b USING (user_id)
        """,
        "event_global_rank": """
            SELECT CAST(event_id AS BIGINT) AS event_id,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   CAST(row_number() OVER (
                     ORDER BY CAST(round(value * 100) AS BIGINT),
                              event_id) AS BIGINT) AS global_rank
            FROM events
        """,
        "event_value_dense_rank": """
            SELECT event_id, event_type, value,
                   CAST(dense_rank() OVER (
                     PARTITION BY event_type ORDER BY value)
                     AS BIGINT) AS dense_rank
            FROM events
        """,
        "event_value_pct_rank": """
            SELECT event_id, event_type, value,
                   percent_rank() OVER (PARTITION BY event_type
                                        ORDER BY value) AS percent_rank
            FROM events
        """,
        "event_value_ntile": """
            SELECT event_id, event_type, value,
                   ntile(7) OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS tile
            FROM events
        """,
        # gap arithmetic is int64 microseconds -> CAST AS DOUBLE ->
        # / 1e6 on BOTH sides, so the quotient is the same IEEE double
        "event_gaps": """
            SELECT event_id, user_id,
                   CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w)
                        AS DOUBLE) / 1000000.0 AS gap_s,
                   lag(value) OVER w AS prev_value
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        # KMV overlap replay: 4-gram construction shares the doc_chunks
        # contract; the string hash is the engine's polynomial replayed
        # by list_reduce over codepoints; sketches are ORDER BY hv
        # LIMIT k; the estimator and sketch algebra are plain BIGINT/
        # double arithmetic — checked on values, not tolerances
        "gram_overlap_est": rf"""
            WITH t AS (
                SELECT doc_id,
                       trim({_WS_NORM_TEXT},
                            ' ' || chr(9) || chr(10) || chr(12) || chr(13)
                       ) AS txt
                FROM documents
            ),
            tok AS (
                SELECT doc_id, regexp_split_to_array(txt, '\s+') AS toks,
                       CASE WHEN length(txt) = 0 THEN 0
                            ELSE array_length(
                                regexp_split_to_array(txt, '\s+'))
                       END AS n
                FROM t
            ),
            g AS (
                SELECT doc_id,
                       array_to_string(list_slice(toks, s, s + 3), ' ')
                           AS gram
                FROM (SELECT doc_id, toks, n,
                             unnest(generate_series(1, n - 3)) AS s
                      FROM tok WHERE n >= 4)
            ),
            ha AS (SELECT DISTINCT {_poly_hash_sql('gram')} AS hv
                   FROM g WHERE doc_id % 20 = 0),
            hb AS (SELECT DISTINCT {_poly_hash_sql('gram')} AS hv
                   FROM g WHERE doc_id % 20 <> 0),
            sa AS (SELECT hv FROM ha ORDER BY hv LIMIT 256),
            sb AS (SELECT hv FROM hb ORDER BY hv LIMIT 256),
            u AS (SELECT hv FROM (SELECT hv FROM sa
                                  UNION SELECT hv FROM sb)
                  ORDER BY hv LIMIT 256),
            est AS (SELECT
                (SELECT count(*) FROM sa) AS na,
                (SELECT max(hv) FROM sa) AS hka,
                (SELECT count(*) FROM sb) AS nb,
                (SELECT max(hv) FROM sb) AS hkb,
                (SELECT count(*) FROM u) AS nu,
                (SELECT max(hv) FROM u) AS hku,
                (SELECT count(*) FROM u
                 WHERE hv IN (SELECT hv FROM sa)
                   AND hv IN (SELECT hv FROM sb)) AS ki),
            fin AS (SELECT
                CAST(CASE WHEN na < 256 THEN na
                          ELSE round(255 * 4294967296.0 / hka)
                     END AS BIGINT) AS est_distinct_a,
                CAST(CASE WHEN nb < 256 THEN nb
                          ELSE round(255 * 4294967296.0 / hkb)
                     END AS BIGINT) AS est_distinct_b,
                CAST(CASE WHEN nu < 256 THEN nu
                          ELSE round(255 * 4294967296.0 / hku)
                     END AS BIGINT) AS est_union,
                CASE WHEN nu = 0 THEN 0.0
                     ELSE CAST(ki AS DOUBLE) / nu END AS jr
                FROM est)
            SELECT est_distinct_a, est_distinct_b, est_union,
                   CAST(round(jr * est_union) AS BIGINT)
                       AS est_intersection,
                   round(jr, 6) AS jaccard
            FROM fin
        """,
        "hourly_approx_users": """
            WITH h AS (
                SELECT DISTINCT
                       strftime(date_trunc('hour', ts),
                                '%Y-%m-%d %H:%M:%S') AS hour,
                       (user_id * 2654435761) % 4294967296 AS hv
                FROM events
            ),
            r AS (
                SELECT hour, hv,
                       row_number() OVER (PARTITION BY hour
                                          ORDER BY hv) AS rn
                FROM h
            ),
            agg AS (
                SELECT hour, count(*) AS nd,
                       max(CASE WHEN rn = 64 THEN hv END) AS hk
                FROM r WHERE rn <= 64 GROUP BY hour
            )
            SELECT hour,
                   CAST(CASE WHEN nd < 64 THEN nd
                             ELSE round(63 * 4294967296.0 / hk)
                        END AS BIGINT) AS approx_users
            FROM agg
        """,
        # KMV sketch replay: same Knuth hash in BIGINT arithmetic, same
        # (k-1)*M/h_k estimator in double arithmetic, half-away round
        "event_type_approx_users": """
            WITH h AS (
                SELECT DISTINCT event_type,
                       (user_id * 2654435761) % 4294967296 AS hv
                FROM events
            ),
            r AS (
                SELECT event_type, hv,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY hv) AS rn
                FROM h
            ),
            agg AS (
                SELECT event_type, count(*) AS nd,
                       max(CASE WHEN rn = 64 THEN hv END) AS hk
                FROM r WHERE rn <= 64 GROUP BY event_type
            )
            SELECT event_type,
                   CAST(CASE WHEN nd < 64 THEN nd
                             ELSE round(63 * 4294967296.0 / hk)
                        END AS BIGINT) AS approx_users
            FROM agg
        """,
        # HyperLogLog replay: Knuth hash in BIGINT, register index =
        # hv % 64, rank = 27 - bitlength(hv // 64) via a comparison
        # CASE chain, registers = MAX per (key, j), harmonic sum in
        # exact BIGINT shifts, then the same double-precision Flajolet
        # estimator expression as ops/sketch._hll_estimate
        "event_type_hll_users": f"""
            WITH h AS (
                SELECT DISTINCT event_type,
                       (user_id * 2654435761) % 4294967296 AS hv
                FROM events
            ),
            regs AS (
                SELECT event_type, hv % 64 AS j,
                       max(27 - ({_bitlen_sql('(hv // 64)', 26)})) AS r
                FROM h GROUP BY event_type, hv % 64
            ),
            sums AS (
                SELECT event_type,
                       sum(CAST(1 AS BIGINT) << (27 - r)) AS sp,
                       count(*) AS np
                FROM regs GROUP BY event_type
            ),
            fin AS (
                SELECT event_type,
                       CAST(sp + (64 - np) * (CAST(1 AS BIGINT) << 27)
                            AS BIGINT) AS s,
                       64 - np AS v
                FROM sums
            )
            SELECT event_type,
                   CAST(round(CASE
                        WHEN {_dbl_sql(_hll_const())} / s <= {_dbl_sql(160.0)}
                             AND v > 0
                            THEN {_dbl_sql(64.0)}
                                 * ln({_dbl_sql(64.0)} / v)
                        WHEN {_dbl_sql(_hll_const())} / s
                             <= {_dbl_sql(4294967296.0)} / {_dbl_sql(30.0)}
                            THEN {_dbl_sql(_hll_const())} / s
                        ELSE -{_dbl_sql(4294967296.0)}
                             * ln({_dbl_sql(1.0)}
                                  - ({_dbl_sql(_hll_const())} / s)
                                    / {_dbl_sql(4294967296.0)})
                   END) AS BIGINT) AS approx_users
            FROM fin
        """,
        # Count-Min replay: the engine's polynomial string hash, then
        # row i's cell = ((a_i*h + b_i) % (2^31-1)) % w in BIGINT
        # arithmetic — cells via GROUP BY, estimate = min over rows
        "event_type_cm_counts": f"""
            WITH i AS (SELECT unnest([0, 1, 2, 3]) AS row_i),
            hv AS (
                SELECT {_poly_hash_sql('event_type')} AS h FROM events
            ),
            cells AS (
                SELECT i.row_i,
                       ((([892314517, 105891749, 537912851, 1419871283]
                              [i.row_i + 1] * hv.h
                          + [330563033, 726012389, 1117280551, 193847297]
                              [i.row_i + 1])
                         % 2147483647) % 1024) AS cell,
                       count(*) AS cnt
                FROM hv CROSS JOIN i GROUP BY 1, 2
            ),
            cand AS (
                SELECT event_type, {_poly_hash_sql('event_type')} AS h
                FROM (SELECT DISTINCT event_type FROM events)
            ),
            candc AS (
                SELECT c.event_type, i.row_i,
                       ((([892314517, 105891749, 537912851, 1419871283]
                              [i.row_i + 1] * c.h
                          + [330563033, 726012389, 1117280551, 193847297]
                              [i.row_i + 1])
                         % 2147483647) % 1024) AS cell
                FROM cand c CROSS JOIN i
            )
            SELECT cc.event_type,
                   CAST(min(cl.cnt) AS BIGINT) AS approx_count
            FROM candc cc
            JOIN cells cl ON cl.row_i = cc.row_i AND cl.cell = cc.cell
            GROUP BY 1
        """,
        # bottom-m quantile-sketch replay: the SAME Knuth hash picks the
        # SAME per-group 256-row sample (ties broken by event_id — a
        # total order), quantile_disc evaluates the same sorted-sample
        # element, so values are bit-exact (no float arithmetic)
        "event_value_quantiles_sketch": """
            WITH r AS (
                SELECT event_type, value,
                       row_number() OVER (
                           PARTITION BY event_type
                           ORDER BY (event_id * 2654435761) % 4294967296,
                                    event_id) AS rn
                FROM events WHERE value IS NOT NULL
            ),
            s AS (SELECT event_type, value FROM r WHERE rn <= 256)
            SELECT event_type, 0.25 AS q,
                   quantile_disc(value, 0.25) AS value
            FROM s GROUP BY event_type
            UNION ALL
            SELECT event_type, 0.5 AS q,
                   quantile_disc(value, 0.5) AS value
            FROM s GROUP BY event_type
            UNION ALL
            SELECT event_type, 0.9 AS q,
                   quantile_disc(value, 0.9) AS value
            FROM s GROUP BY event_type
            UNION ALL
            SELECT event_type, 0.99 AS q,
                   quantile_disc(value, 0.99) AS value
            FROM s GROUP BY event_type
        """,
        "events_above_median": """
            WITH t AS (
                SELECT event_type,
                       quantile_disc(value, 0.5) AS thr
                FROM events GROUP BY event_type
            )
            SELECT event_id, e.event_type, value
            FROM events e JOIN t USING (event_type)
            WHERE value >= thr
        """,
        "ann_top10": """
            SELECT vec_id FROM embeddings
            ORDER BY list_cosine_similarity(
                embedding,
                (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC,
                vec_id
            LIMIT 10
        """,
        # replays the IVF probe from the index the Ray query persisted:
        # nearest-nprobe cells from centroids.parquet (ties by cell id,
        # matching IVFIndex.probe_cells), exact cosine top-k over ONLY
        # those cells' partition directories (hive `_cell=` layout)
        "ann_ivf_top10": f"""
            WITH q AS (
              SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings WHERE vec_id = 0
            ),
            probed AS (
              SELECT cell
              FROM read_parquet('{_ivf_index_path(_oracle_n())}/centroids.parquet'), q
              ORDER BY list_cosine_similarity(centroid, q.e) DESC, cell
              LIMIT 4
            )
            SELECT v.vec_id
            FROM read_parquet(
                '{_ivf_index_path(_oracle_n())}/cells/*/*.parquet',
                hive_partitioning = 1) v, q
            WHERE CAST(v._cell AS BIGINT) IN (SELECT cell FROM probed)
            ORDER BY list_cosine_similarity(
                list_transform(v.embedding, x -> CAST(x AS DOUBLE)), q.e)
                DESC, v.vec_id
            LIMIT 10
        """,
        # RRF hybrid fusion: int8-quantization CTE (same contract as
        # embedding_quantized), integer dot + squared-L2 rankings
        # truncated at 20, exact-integer 10**9 // (60 + rank) fusion
        "ann_rrf_top10": """
            WITH s AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
                       list_max(list_transform(
                           embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale
                FROM embeddings
            ),
            codes AS (
                SELECT vec_id, dim,
                       CAST(CASE WHEN scale > 0
                                 THEN round(x * 127 / scale)
                                 ELSE 0 END AS BIGINT) AS qval
                FROM (SELECT vec_id, scale, unnest(e) AS x,
                             generate_subscripts(e, 1) AS dim
                      FROM s)
            ),
            q AS (SELECT * FROM codes WHERE vec_id % 131 = 0),
            dots AS (
                SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                       sum(q.qval * c.qval) AS dot,
                       sum((q.qval - c.qval) * (q.qval - c.qval)) AS l2
                FROM q JOIN codes c ON q.dim = c.dim
                GROUP BY 1, 2
            ),
            ra AS (SELECT query_id, vec_id, row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY dot DESC, vec_id ASC) AS r FROM dots),
            rb AS (SELECT query_id, vec_id, row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY l2 ASC, vec_id ASC) AS r FROM dots),
            lists AS (
                SELECT query_id, vec_id, 1000000000 // (60 + r) AS rrf
                FROM ra WHERE r <= 20
                UNION ALL
                SELECT query_id, vec_id, 1000000000 // (60 + r)
                FROM rb WHERE r <= 20
            ),
            fused AS (
                SELECT query_id, vec_id, CAST(sum(rrf) AS BIGINT) AS rrf
                FROM lists GROUP BY 1, 2
            )
            SELECT query_id, vec_id, rrf, CAST(rank AS BIGINT) AS rank
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY query_id
                      ORDER BY rrf DESC, vec_id ASC) AS rank
                  FROM fused)
            WHERE rank <= 10
        """,
        "ann_ivf_appended": f"""
            WITH q AS (
              SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings WHERE vec_id = 0
            ),
            probed AS (
              SELECT cell
              FROM read_parquet('{_ivf_index_path(_oracle_n())}_app/centroids.parquet'), q
              ORDER BY list_cosine_similarity(centroid, q.e) DESC, cell
              LIMIT 4
            )
            SELECT v.vec_id
            FROM read_parquet(
                '{_ivf_index_path(_oracle_n())}_app/cells/*/*.parquet',
                hive_partitioning = 1) v, q
            WHERE CAST(v._cell AS BIGINT) IN (SELECT cell FROM probed)
            ORDER BY list_cosine_similarity(
                list_transform(v.embedding, x -> CAST(x AS DOUBLE)), q.e)
                DESC, v.vec_id
            LIMIT 10
        """,
        # decontamination: distinct token 8-grams (same lower + ws-
        # normalize + single-space tokenize contract as the token-count
        # oracles; n=4 for signal density on the synthetic corpus),
        # benchmark = doc_id % 20 == 0, count of shared grams
        # Bloom replay: per-doc DISTINCT 4-grams (the gram_overlap_est
        # construction), benchmark bit positions = 3 affine hashes of
        # the poly hash in BIGINT, a gram hits iff ALL its positions
        # are set — false positives replay identically on both sides
        "doc_contamination_bloom": rf"""
            WITH t AS (
                SELECT doc_id,
                       trim({_WS_NORM_TEXT},
                            ' ' || chr(9) || chr(10) || chr(12) || chr(13)
                       ) AS txt
                FROM documents
            ),
            tok AS (
                SELECT doc_id, regexp_split_to_array(txt, '\s+') AS toks,
                       CASE WHEN length(txt) = 0 THEN 0
                            ELSE array_length(
                                regexp_split_to_array(txt, '\s+'))
                       END AS n
                FROM t
            ),
            g AS (
                SELECT DISTINCT doc_id,
                       array_to_string(list_slice(toks, s, s + 3), ' ')
                           AS gram
                FROM (SELECT doc_id, toks, n,
                             unnest(generate_series(1, n - 3)) AS s
                      FROM tok WHERE n >= 4)
            ),
            i AS (SELECT unnest([0, 1, 2]) AS row_i),
            bh AS (SELECT DISTINCT {_poly_hash_sql('gram')} AS h
                   FROM g WHERE doc_id % 20 = 0),
            bits AS (
                SELECT DISTINCT
                       ((([892314517, 105891749, 537912851][row_i + 1] * h
                          + [330563033, 726012389, 1117280551][row_i + 1])
                         % 2147483647) % 65536) AS pos
                FROM bh CROSS JOIN i
            ),
            probe AS (SELECT doc_id, gram,
                             {_poly_hash_sql('gram')} AS h
                      FROM g WHERE doc_id % 20 <> 0),
            ph AS (
                SELECT doc_id, gram,
                       ((([892314517, 105891749, 537912851][row_i + 1] * h
                          + [330563033, 726012389, 1117280551][row_i + 1])
                         % 2147483647) % 65536) AS pos
                FROM probe CROSS JOIN i
            ),
            gm AS (
                SELECT ph.doc_id, ph.gram,
                       min(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END)
                           AS allset
                FROM ph LEFT JOIN bits b ON b.pos = ph.pos
                GROUP BY ph.doc_id, ph.gram
            )
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                   CAST(sum(allset) AS BIGINT) AS n_bloom_hits,
                   sum(allset) > 0 AS maybe_contaminated
            FROM gm GROUP BY doc_id
        """,
        # per remaining doc
        "doc_contamination": f"""
            WITH norm AS (
              SELECT doc_id,
                     lower(trim(regexp_replace({ws_normalize_sql("text")},
                                               '\\s+', ' ', 'g'))) AS t
              FROM documents
            ),
            tok AS (
              SELECT doc_id, string_split(t, ' ') AS toks
              FROM norm WHERE t <> ''
            ),
            grams AS (
              SELECT DISTINCT doc_id,
                     array_to_string(list_slice(toks, i, i + 3), ' ') AS gram
              FROM (
                SELECT doc_id, toks,
                       unnest(generate_series(1, len(toks) - 3)) AS i
                FROM tok WHERE len(toks) >= 4)
            ),
            bench AS (
              SELECT DISTINCT gram FROM grams WHERE doc_id % 20 = 0
            ),
            hits AS (
              SELECT c.doc_id, count(*) AS n
              FROM grams c JOIN bench b USING (gram)
              WHERE c.doc_id % 20 <> 0
              GROUP BY c.doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated_grams,
                   coalesce(h.n, 0) > 0 AS contaminated
            FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) d
            LEFT JOIN hits h USING (doc_id)
        """,
        # int8 quantization replay: scale = max|x| (exact double of the
        # same float32), qval = round(x*127/scale) with DuckDB's
        # half-away ties matching util.round_half_away
        "embedding_quantized": """
            WITH s AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
                       list_max(list_transform(
                           embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale
                FROM embeddings
            )
            SELECT vec_id, CAST(dim - 1 AS BIGINT) AS dim,
                   CAST(CASE WHEN scale > 0
                             THEN round(x * 127 / scale)
                             ELSE 0 END AS BIGINT) AS qval,
                   coalesce(scale, 0.0) AS scale
            FROM (SELECT vec_id, scale, unnest(e) AS x,
                         generate_subscripts(e, 1) AS dim
                  FROM s)
        """,
        # Gram replay: the embedding_quantized CTE self-joined on
        # vec_id; integer products so the sum is exact
        "embedding_gram": """
            WITH s AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
                       list_max(list_transform(
                           embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale
                FROM embeddings
            ), qv AS (
                SELECT vec_id, CAST(dim - 1 AS BIGINT) AS dim,
                       CAST(CASE WHEN scale > 0
                                 THEN round(x * 127 / scale)
                                 ELSE 0 END AS BIGINT) AS qval
                FROM (SELECT vec_id, scale, unnest(e) AS x,
                             generate_subscripts(e, 1) AS dim
                      FROM s)
            )
            SELECT a.dim AS i, b.dim AS j,
                   CAST(sum(a.qval * b.qval) AS BIGINT) AS sum_qq
            FROM qv a JOIN qv b USING (vec_id)
            WHERE a.dim <= b.dim
            GROUP BY a.dim, b.dim
        """,
        "embedding_projection": f"""
            WITH s AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
                       list_max(list_transform(
                           embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale
                FROM embeddings
            ), qv AS (
                SELECT vec_id, CAST(dim - 1 AS BIGINT) AS dim,
                       CAST(CASE WHEN scale > 0
                                 THEN round(x * 127 / scale)
                                 ELSE 0 END AS BIGINT) AS qval
                FROM (SELECT vec_id, scale, unnest(e) AS x,
                             generate_subscripts(e, 1) AS dim
                      FROM s)
            )
            SELECT vec_id, CAST(comp AS BIGINT) AS comp,
                   CAST(sum(qval * sign) AS BIGINT) AS proj_q
            FROM qv JOIN {_projection_sign_values_sql(64, 8, 7)}
                 USING (dim)
            GROUP BY vec_id, comp
        """,
        # assignment replay from the persisted centroids: identical
        # ||c||^2 - 2 x.c expression, ties to the lowest cell id
        "embedding_kmeans_cells": f"""
            WITH c AS (
                SELECT CAST(cell AS BIGINT) AS cell, centroid,
                       list_dot_product(centroid, centroid) AS cc
                FROM read_parquet(
                    '{{KMEANS_PATH}}/centroids.parquet')
            ), d AS (
                SELECT e.vec_id, c.cell,
                       c.cc - 2 * list_dot_product(
                           list_transform(e.embedding,
                                          x -> CAST(x AS DOUBLE)),
                           c.centroid) AS dist
                FROM embeddings e CROSS JOIN c
            )
            SELECT vec_id, cell FROM (
                SELECT vec_id, cell,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dist, cell) AS rn
                FROM d) WHERE rn = 1
        """.replace("{KMEANS_PATH}", _kmeans_path(_oracle_n())),
        # PCA projection replay from the persisted (mean, W): the
        # eigen FIT is numpy-oracled in tests; the projection
        # (x - mu) @ W is replayed per component from components.parquet
        "embedding_pca2": f"""
            WITH comp AS (
                SELECT CAST(comp AS BIGINT) AS comp,
                       CAST(dim AS BIGINT) AS dim, w, mu
                FROM read_parquet('{{PCA_PATH}}/components.parquet')
            ),
            x AS (
                SELECT vec_id,
                       unnest(list_transform(embedding,
                                             v -> CAST(v AS DOUBLE))) AS xv,
                       generate_subscripts(embedding, 1) AS dim
                FROM embeddings
            )
            SELECT x.vec_id, c.comp,
                   round(sum((x.xv - c.mu) * c.w), 6) AS value
            FROM x JOIN comp c ON c.dim = x.dim - 1
            GROUP BY x.vec_id, c.comp
        """.replace("{PCA_PATH}", _pca_path(_oracle_n())),
        "embedding_norms": """
            SELECT vec_id,
                   round(sqrt(list_dot_product(
                       list_transform(embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(embedding, x -> CAST(x AS DOUBLE)))), 4)
                       AS l2_norm
            FROM embeddings
        """,
        # motion replay: lag() the persisted pixel lists per video in
        # frame order, mean |diff| = exact integer sum / count
        "video_motion": """
            WITH f AS (
                SELECT media_id, frame_idx, pixels,
                       lag(pixels) OVER (PARTITION BY media_id
                                         ORDER BY frame_idx) AS prev
                FROM read_parquet(
                    '/tmp/er_media/video_motion_decoded.parquet')
            )
            SELECT media_id, frame_idx,
                   round(CAST(list_sum(list_transform(
                             generate_series(1, len(pixels)),
                             j -> abs(pixels[j] - prev[j]))) AS DOUBLE)
                         / len(pixels), 6) AS mean_abs_diff
            FROM f WHERE prev IS NOT NULL
        """,
        # strict Y4M frame sampling: expected (media_id, frame_idx)
        # pairs replay the (i * n_frames) // k arithmetic from the
        # persisted metadata; stats replay over the persisted decoded
        # luma pixels; LEFT JOIN so a mis-sampled frame surfaces as
        # NULL stats instead of silently dropping
        "video_frames": """
            WITH meta AS (
                SELECT media_id, n_frames
                FROM read_parquet('/tmp/er_media/video_meta.parquet')
            ),
            exp AS (
                SELECT media_id,
                       (i * CAST(n_frames AS BIGINT))
                           // least(3, n_frames) AS frame_idx
                FROM (SELECT media_id, n_frames,
                             unnest(generate_series(
                                 0, least(3, n_frames) - 1)) AS i
                      FROM meta)
            ),
            px AS (
                SELECT media_id, frame_idx, unnest(pixels) AS p
                FROM read_parquet(
                    '/tmp/er_media/video_frames_decoded.parquet')
            ),
            st AS (
                SELECT media_id, frame_idx, count(*) AS n_pixels,
                       sum(p) AS s, max(p) AS mx, min(p) AS mn
                FROM px GROUP BY media_id, frame_idx
            )
            SELECT e.media_id, CAST(e.frame_idx AS BIGINT) AS frame_idx,
                   round(CAST(s AS DOUBLE) / n_pixels, 6) AS mean_luma,
                   CAST(mx AS BIGINT) AS max_luma,
                   CAST(mn AS BIGINT) AS min_luma,
                   CAST(n_pixels AS BIGINT) AS n_pixels
            FROM exp e LEFT JOIN st USING (media_id, frame_idx)
        """,
        # MP4 sample extraction: sampling arithmetic replayed from the
        # metadata; per-sample pts/size/byte-sum from the GENERATOR's
        # truth table, never the parser's output
        "video_mp4_samples": """
            WITH meta AS (
                SELECT media_id, n_frames
                FROM read_parquet('/tmp/er_media/mp4_meta.parquet')
            ),
            exp AS (
                SELECT media_id,
                       (i * CAST(n_frames AS BIGINT))
                           // least(3, n_frames) AS frame_idx
                FROM (SELECT media_id, n_frames,
                             unnest(generate_series(
                                 0, least(3, n_frames) - 1)) AS i
                      FROM meta)
            ),
            truth AS (
                SELECT * FROM read_parquet(
                    '/tmp/er_media/mp4_truth.parquet')
            )
            SELECT e.media_id, CAST(e.frame_idx AS BIGINT) AS frame_idx,
                   CAST(t.pts AS BIGINT) AS pts,
                   CAST(t.timescale AS BIGINT) AS timescale,
                   t.codec AS codec,
                   CAST(t.n_bytes AS BIGINT) AS n_bytes,
                   CAST(t.byte_sum AS BIGINT) AS byte_sum
            FROM exp e LEFT JOIN truth t
              ON t.media_id = e.media_id AND t.sample_idx = e.frame_idx
        """,
        "label_centroids": """
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(dim - 1 AS BIGINT) AS dim,
                   round(sum(CAST(x AS DOUBLE)) / count(*), 6) AS centroid
            FROM (SELECT label, unnest(embedding) AS x,
                         generate_subscripts(embedding, 1) AS dim
                  FROM embeddings)
            GROUP BY label, dim
        """,
        # grouped_ols replay: the identical closed form over the same
        # exact integer sums (HUGEINT here, Python big-int in the
        # engine); each output is one CAST-to-DOUBLE per operand and
        # one IEEE op in the same order, so the floats agree bit-for-bit
        "event_hour_value_ols": """
            WITH t AS (
                SELECT event_type,
                       CAST(hour(ts) AS BIGINT) AS x,
                       CAST(round(value * 100) AS BIGINT) AS y
                FROM events
            ), s AS (
                SELECT event_type, count(*) AS n,
                       sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
                       sum(y*y) AS syy, sum(x*y) AS sxy
                FROM t GROUP BY 1
            )
            SELECT event_type,
                   CAST(n*sxy - sx*sy AS DOUBLE)
                     / CAST(n*sxx - sx*sx AS DOUBLE) AS slope,
                   (CAST(sy AS DOUBLE)
                    - (CAST(n*sxy - sx*sy AS DOUBLE)
                       / CAST(n*sxx - sx*sx AS DOUBLE))
                      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
                     AS intercept,
                   CAST((n*sxy - sx*sy) * (n*sxy - sx*sy) AS DOUBLE)
                     / CAST((n*sxx - sx*sx) * (n*syy - sy*sy) AS DOUBLE)
                     AS r2
            FROM s
        """,
        "supplier_pagerank": _pagerank_sql(3),
        "cust_supp_communities": _lpa_sql(3),
        "user_event_transitions": """
            WITH lagged AS (
                SELECT event_type AS cur_type,
                       lag(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_type
                FROM events
            )
            SELECT prev_type, cur_type, count(*) AS n
            FROM lagged WHERE prev_type IS NOT NULL
            GROUP BY prev_type, cur_type
        """,
        "supplier_bfs_hops": """
            WITH RECURSIVE raw AS (
                SELECT 'c' || CAST(o_custkey AS BIGINT) AS a,
                       's' || CAST(l_suppkey AS BIGINT) AS b
                FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            ),
            sym AS (
                SELECT DISTINCT a AS src, b AS dst FROM raw WHERE a <> b
                UNION
                SELECT DISTINCT b AS src, a AS dst FROM raw WHERE a <> b
            ),
            seeds AS (
                SELECT DISTINCT 'c' || CAST(c_custkey AS BIGINT) AS node
                FROM customer WHERE c_custkey % 17 = 0
            ),
            walk(node, hop) AS (
                SELECT node, 0 FROM seeds
                UNION
                SELECT s.dst, w.hop + 1
                FROM walk w JOIN sym s ON s.src = w.node
                WHERE w.hop < 2
            )
            SELECT node, CAST(min(hop) AS BIGINT) AS hop
            FROM walk GROUP BY node
        """,
        "supplier_adamic_adar": f"""
            WITH raw AS (
                SELECT DISTINCT 'c' || CAST(o_custkey AS BIGINT) AS a,
                       's' || CAST(l_suppkey AS BIGINT) AS b
                FROM orders JOIN lineitem ON l_orderkey = o_orderkey
                WHERE l_quantity >= 45
            ),
            e AS (SELECT a, b FROM raw WHERE a <> b),
            sym AS (
                SELECT a AS src, b AS dst FROM e
                UNION
                SELECT b AS src, a AS dst FROM e
            ),
            deg AS (SELECT src AS node, count(*) AS deg
                    FROM sym GROUP BY src),
            -- the engine's driver-generated fixed-point weight table,
            -- embedded verbatim: floor(1e9 / math.log(deg))
            wt(wdeg, w) AS (VALUES {_aa_weight_values()}),
            pairs AS (
                SELECT s1.dst AS u, s2.dst AS v, wt.w
                FROM sym s1
                JOIN sym s2 ON s1.src = s2.src AND s1.dst < s2.dst
                JOIN deg d ON d.node = s1.src
                JOIN wt ON wt.wdeg = d.deg
            )
            SELECT u, v, CAST(sum(w) AS BIGINT) AS aa_score
            FROM pairs GROUP BY u, v
        """,
        "cust_supp_kcore": _kcore_sql(10, 8),
        # negative mining replay: same Knuth arithmetic over the dense
        # id domain, accidental positives dropped by direct text
        # equality (engine: md5-digest equality — equivalent)
        "doc_contrastive_negatives": """
            WITH d AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       coalesce(text, '') AS t
                FROM documents
            ),
            nn AS (SELECT count(*) AS n FROM d),
            c AS (
                SELECT d.doc_id, j,
                       ((d.doc_id * 2654435761 + j * 40503)
                        % 4294967296) % ((SELECT n FROM nn) - 1) AS neg0
                FROM d, (SELECT unnest(generate_series(1, 2)) AS j) js
            ),
            c2 AS (
                SELECT doc_id, CAST(j AS BIGINT) AS j,
                       CAST(neg0 + CASE WHEN neg0 >= doc_id
                                        THEN 1 ELSE 0 END
                            AS BIGINT) AS neg_id
                FROM c
            )
            SELECT c2.doc_id, c2.neg_id, c2.j
            FROM c2 JOIN d a ON a.doc_id = c2.doc_id
                    JOIN d b ON b.doc_id = c2.neg_id
            WHERE a.t <> b.t
        """,
        "event_cube": """
            WITH t AS (
                SELECT event_type,
                       CAST(hour(ts) AS VARCHAR) AS hr,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events
            )
            SELECT coalesce(event_type, '(all)') AS event_type,
                   coalesce(hr, '(all)') AS hr,
                   CAST(sum(cents) AS BIGINT) AS cents
            FROM t GROUP BY CUBE (event_type, hr)
        """,
        # MI replay: identical per-cell expression from the same exact
        # integer counts, rounded to 6 (the grouped_entropy pattern)
        "event_type_hour_mi": """
            WITH t AS (
                SELECT event_type AS a,
                       CAST(hour(ts) AS VARCHAR) AS b
                FROM events
            ),
            c AS (SELECT a, b, count(*) AS n FROM t GROUP BY 1, 2),
            ma AS (SELECT a, sum(n) AS na FROM c GROUP BY 1),
            mb AS (SELECT b, sum(n) AS nb FROM c GROUP BY 1),
            tot AS (SELECT sum(n) AS nn FROM c)
            SELECT round(sum((n / CAST(nn AS DOUBLE))
                             * ln(CAST(n * nn AS DOUBLE)
                                  / CAST(na * nb AS DOUBLE))), 6) AS mi,
                   CAST(max(nn) AS BIGINT) AS n_rows
            FROM c JOIN ma USING (a) JOIN mb USING (b), tot
        """,
        # fixed-point EWMA replay: the identical integer recursion,
        # stepped row-by-row per user by a recursive CTE (operands are
        # non-negative, so engine floor division == DuckDB //)
        "user_value_ewma": """
            WITH RECURSIVE x AS (
                SELECT CAST(event_id AS BIGINT) AS event_id, user_id,
                       CAST(round(value * 100) AS BIGINT) AS cents,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS i
                FROM events
            ),
            rec(user_id, i, event_id, ew) AS (
                SELECT user_id, i, event_id, cents FROM x WHERE i = 1
                UNION ALL
                SELECT x.user_id, x.i, x.event_id,
                       (25 * x.cents + 75 * rec.ew) // 100
                FROM rec JOIN x
                  ON x.user_id = rec.user_id AND x.i = rec.i + 1
            )
            SELECT event_id, CAST(ew AS BIGINT) AS ewma_cents FROM rec
        """,
        # triangle replay: with a<b canonical edges, each triangle
        # {x<y<z} matches exactly once as (x,y)+(y,z)+(x,z); counts are
        # exact integers so the counting strategy (degree-ordered
        # wedges in the engine, a 3-way self-join here) cannot diverge
        "part_copurchase_triangles": """
            WITH pe AS MATERIALIZED (
                SELECT DISTINCT least(l1.l_partkey, l2.l_partkey) AS a,
                       greatest(l1.l_partkey, l2.l_partkey) AS b
                FROM lineitem l1 JOIN lineitem l2
                  ON l1.l_orderkey = l2.l_orderkey
                 AND l1.l_partkey <> l2.l_partkey
            ),
            tri AS MATERIALIZED (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM pe e1
                JOIN pe e2 ON e2.a = e1.b
                JOIN pe e3 ON e3.a = e1.a AND e3.b = e2.b
            )
            SELECT CAST(node AS BIGINT) AS node,
                   CAST(count(*) AS BIGINT) AS n_tri
            FROM (SELECT x AS node FROM tri
                  UNION ALL SELECT y FROM tri
                  UNION ALL SELECT z FROM tri)
            GROUP BY node
        """,
        # Every queries() entry is value-oracled: the non-SQL-native ones
        # (fingerprint winnowing, minhash/simhash banding, RHP-LSH, GBDT
        # + rule cascade, union-find closure, IVF probe, fake-decode
        # features) are replayed above either by compiling the exact
        # kernel into SQL or by reading the deterministic intermediates
        # the query persists (er_* corpus, /tmp/er_media, /tmp/er_ivf_*).
    }
