"""Local mirror of the driver's correctness gate: run every queries()
entry at a given sf_dir, compare row-count/schema/values against
oracle_sql() via DuckDB (order-insensitive, columns sorted by name)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def oracle_con(sf_dir: str):
    """DuckDB connection with the driver's table views registered."""
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def compare_frames(name: str, res, exp) -> list[str]:
    """Driver-style compare of two canon() frames -> list of mismatch
    descriptions (empty = pass)."""
    import numpy as np

    errs = []
    if list(res.columns) != list(exp.columns):
        return [f"{name}: columns {list(res.columns)} != {list(exp.columns)}"]
    if len(res) != len(exp):
        return [f"{name}: rows {len(res)} != {len(exp)}"]
    for c in res.columns:
        a, b = res[c].to_numpy(), exp[c].to_numpy()
        a_float = np.issubdtype(np.asarray(a).dtype, np.floating)
        b_float = np.issubdtype(np.asarray(b).dtype, np.floating)
        a_int = np.issubdtype(np.asarray(a).dtype, np.integer)
        b_int = np.issubdtype(np.asarray(b).dtype, np.integer)
        # dtype-strict on the int/float axis: the driver hashes raw values,
        # so int64 vs float64 fails there even when numerically equal
        # (r4: DuckDB sum(BIGINT)->HUGEINT->float64). Mirror that here.
        if (a_int and b_float) or (a_float and b_int):
            errs.append(f"{name}: col {c} dtype mismatch (engine "
                        f"{np.asarray(a).dtype} vs oracle "
                        f"{np.asarray(b).dtype}) — driver hash would fail")
            break
        if a_float or b_float:
            # equal_nan: SQL NULL comes back as NaN on both sides and
            # the driver's value hash treats the two alike (orders_asof
            # has NULL last_order_key rows and passes hash_match)
            same = np.allclose(a.astype(float), b.astype(float),
                               rtol=0, atol=0, equal_nan=True)
        else:
            same = (a == b).all()
        if not same:
            bad = np.where(a != b)[0][:3] if a.dtype == b.dtype else [0]
            errs.append(f"{name}: col {c} differs at rows {bad}; "
                        f"got {a[bad]} want {b[bad]}")
            break
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as entry_mod

    # point the er_* oracle SQL at the corpus sized for THIS sf_dir
    os.environ["GRAFT_ORACLE_N"] = str(entry_mod._corpus_entities(sf_dir))
    os.environ["GRAFT_ORACLE_SF"] = sf_dir
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = oracle_con(sf_dir)

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {str(e)[-160:]}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(res)} (rows-only) {dt:.1f}s")
            n_pass += 1
            continue
        try:
            exp = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle raised {e}")
            n_fail += 1
            continue
        errs = compare_frames(name, res, exp)
        for e in errs:
            print(f"FAIL {e}")
        if not errs:
            print(f"PASS {name}: rows={len(res)} {dt:.1f}s")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
