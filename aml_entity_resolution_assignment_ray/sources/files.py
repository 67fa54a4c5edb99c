"""Text-format sources/sinks: JSONL and CSV.

Ray Data reads both natively — ``read_json`` / ``read_csv`` stream file
shards as blocks exactly like parquet, so a pipeline over a JSONL or
CSV landing zone is the same streaming Dataset as a parquet one (the
reference ingests its corpus from CSV shards, data_generator.py, and
ships eval output as CSV, matching.py sinks).  The exporters here
round-trip a Dataset through the text formats deterministically so the
read path is value-checkable against a DuckDB ``read_json_auto`` /
``read_csv_auto`` oracle over the same files.

Scale notes: export writes one file per block (resumable, never one
giant file); readers get ``file_extensions`` filters so stray files in
a landing zone are ignored.  Text formats lose parquet's types — the
exporters therefore take only columns that survive the round trip
exactly (ints, strings, bools); floats should be converted to integer
units (e.g. cents) upstream when exact parity matters.  Content
caveats (pinned in tests/test_files.py): JSONL round-trips every
string exactly including the empty-vs-null distinction; CSV preserves
quoted/escaped content (commas, quotes, embedded newlines, unicode)
but COLLAPSES null-vs-empty — export only non-null string columns to
CSV when that distinction matters.
"""

from __future__ import annotations

import os
import shutil

import ray.data as rd


def export_jsonl(ds, out_dir: str) -> str:
    """Write ``ds`` as newline-delimited JSON shards (one ``.json`` file
    per block).  The directory is replaced atomically-enough for a
    single writer: wiped, then rewritten."""
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    ds.write_json(out_dir)
    return out_dir


def export_csv(ds, out_dir: str) -> str:
    """Write ``ds`` as headered CSV shards (one ``.csv`` per block)."""
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    ds.write_csv(out_dir)
    return out_dir


def export_partitioned_parquet(ds, out_dir: str,
                               partition_cols: list[str]) -> str:
    """Write ``ds`` as hive-partitioned parquet
    (``out_dir/col=value/...``) — the resumable-output layout: one
    directory per key, so a consumer can read (and a restarted
    producer can skip) single partitions by PATH, no row filtering."""
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir, partition_cols=partition_cols)
    return out_dir


def read_partition(out_dir: str, col: str, value) -> "rd.Dataset":
    """Stream ONE hive partition — physical pruning: only that
    directory's files are listed or opened."""
    return rd.read_parquet(os.path.join(out_dir, f"{col}={value}"))


def read_jsonl(path: str):
    """Stream a JSONL directory/file as a Dataset."""
    return rd.read_json(path, file_extensions=["json", "jsonl"])


def read_csv(path: str):
    """Stream a CSV directory/file as a Dataset."""
    return rd.read_csv(path, file_extensions=["csv"])


def read_jsonl_lines(path: str, fields: dict):
    """Schema-on-read JSONL ingest: stream the files as TEXT LINES
    (``rd.read_text``) and parse each line with the stdlib JSON
    parser, projecting ``fields`` (name -> pandas dtype string).

    This is the quarantine path for 100-TB landing zones where a
    native reader would reject a whole file over one bad record:
    lines that fail to parse, or parse to a non-object, or lack any
    requested field, are DROPPED (the native ``read_jsonl`` reader
    stays the fast path for clean zones — both are value-checked
    against the same files in tests/queries).

    Parsing is per-line by necessity (ragged text); the projection
    and dtype coercion are vectorized per batch."""
    import json

    import pandas as pd

    names = list(fields)

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        recs = []
        for line in df["text"]:
            try:
                o = json.loads(line)
            except (ValueError, TypeError):
                continue
            if isinstance(o, dict) and all(k in o for k in names):
                recs.append(o)
        out = {}
        for k in names:
            t = fields[k]
            dt = object if t in ("str", str) else t
            out[k] = pd.Series([r[k] for r in recs], dtype=dt) if recs \
                else pd.Series([], dtype=dt)
        return pd.DataFrame(out)

    return rd.read_text(path, file_extensions=["json", "jsonl"]) \
        .map_batches(parse, batch_format="pandas")


def range_bucket(ds, *, col: str, boundaries, out_col: str = "bucket"):
    """Append a range-partition bucket for a NUMERIC column: bucket i
    holds rows with ``boundaries[i-1] < v <= boundaries[i]`` (bucket 0
    below the first boundary, bucket len(boundaries) above the last) —
    the numeric sibling of hive partitioning: feed the bucket to
    ``export_partitioned_parquet(partition_cols=[out_col])`` and a
    consumer prunes by VALUE RANGE at the directory level, no row
    filtering.  Stateless vectorized searchsorted, no shuffle."""
    import numpy as np
    import pandas as pd

    b = np.asarray(sorted(boundaries), dtype=np.int64)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out[out_col] = np.searchsorted(
            b, df[col].to_numpy(np.int64), side="left").astype(np.int64)
        return out

    return ds.map_batches(tag, batch_format="pandas")


def union_by_name(datasets):
    """Schema-evolution union: align Datasets whose schemas share a
    core but differ by added/removed columns — the heterogeneous-
    generation landing zone (a year-old shard lacks the column last
    month's writer added).  Missing columns fill with NULLs of the
    other side's dtype; the output schema is the UNION of all input
    schemas, columns ordered by first appearance.  Mirrors DuckDB's
    ``read_parquet(..., union_by_name=true)``.

    Stateless per-block projection on each input, then a plain
    (zero-shuffle) Dataset union."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    schemas = []
    for ds in datasets:
        s = ds.schema()
        base = getattr(s, "base_schema", None)
        schemas.append(base if isinstance(base, pa.Schema) else None)
    all_cols: list = []
    types: dict = {}
    for ds, s in zip(datasets, schemas):
        names = s.names if s is not None else ds.schema().names
        for i, c in enumerate(names):
            if c not in types:
                all_cols.append(c)
                types[c] = s.field(c).type if s is not None else None

    def align(d: pd.DataFrame) -> pd.DataFrame:
        out = {}
        for c in all_cols:
            if c in d.columns:
                out[c] = d[c]
            else:
                t = types[c]
                if t is not None and pa.types.is_integer(t):
                    out[c] = pd.array([None] * len(d), dtype="Int64")
                elif t is not None and pa.types.is_floating(t):
                    out[c] = np.full(len(d), np.nan)
                else:
                    out[c] = pd.Series([None] * len(d), dtype=object)
        return pd.DataFrame(out)

    aligned = [ds.map_batches(align, batch_format="pandas")
               for ds in datasets]
    return aligned[0] if len(aligned) == 1 \
        else aligned[0].union(*aligned[1:])
