"""Per-stage Parquet checkpoints with lineage manifests.

The reference's only resume behavior is "load the pickled LSH index if
present, else rebuild" (reference matching.py:86-119, api.py:101-150).
The north_rule requires real resumability: every stage checkpoints its
output as partitioned Parquet plus a manifest carrying

* the stage's LINEAGE HASH — sha256 over (stage name, engine config,
  upstream lineage hashes) — so a resumed run only reuses a checkpoint
  produced by the same upstream chain and configuration;
* per-partition metrics (file, rows, bytes) and stage totals (rows,
  wall seconds, rows/sec).

``CheckpointManager.stage(name, build, deps)`` returns the
checkpointed Dataset, skipping recomputation when a manifest with the
matching lineage exists (kill the driver at any point; the rerun
resumes after the last completed stage).  Writes go to ``<dir>.tmp``
and are renamed into place, so a partial write is never mistaken for a
complete checkpoint.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import pyarrow.parquet as pq


def input_fingerprint(path: str) -> str:
    """Cheap content fingerprint of an input directory/file: sorted
    relative names + sizes + mtimes.  Folded into the root stage's
    lineage so a rerun against a DIFFERENT corpus at the same checkpoint
    dir rebuilds instead of silently reusing stale results."""
    h = hashlib.sha256()
    if os.path.isfile(path):
        st = os.stat(path)
        h.update(f"{os.path.basename(path)}|{st.st_size}|{st.st_mtime_ns}".encode())
    elif os.path.isdir(path):
        for root, _, files in sorted(os.walk(path)):
            for f in sorted(files):
                fp = os.path.join(root, f)
                st = os.stat(fp)
                rel = os.path.relpath(fp, path)
                h.update(f"{rel}|{st.st_size}|{st.st_mtime_ns}".encode())
    else:
        h.update(path.encode())
    return h.hexdigest()


class CheckpointManager:
    def __init__(self, root: str, run_id: str = "default",
                 config: dict | None = None, input_path: str | None = None):
        self.base = os.path.join(root, run_id)
        os.makedirs(self.base, exist_ok=True)
        self.config = config or {}
        self._config_hash = hashlib.sha256(
            json.dumps(self.config, sort_keys=True, default=str).encode()
        ).hexdigest()
        if input_path is not None:
            self._config_hash = hashlib.sha256(
                (self._config_hash + input_fingerprint(input_path)).encode()
            ).hexdigest()
        self._lineage: dict[str, str] = {}
        self.events: list[dict] = []

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.base, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.base, f"{name}.manifest.json")

    def register_input(self, name: str, path: str):
        """Expose an external input as a dependency node: a stage that
        lists ``name`` in its deps rebuilds when the input's content
        fingerprint changes — and ONLY that stage (plus its dependents),
        unlike config entries, which invalidate every stage."""
        self._lineage[name] = input_fingerprint(path)

    def lineage_hash(self, name: str, deps: list[str]) -> str:
        h = hashlib.sha256()
        h.update(name.encode())
        h.update(self._config_hash.encode())
        for d in deps:
            if d not in self._lineage:
                raise ValueError(f"stage {name}: dependency {d} not built")
            h.update(self._lineage[d].encode())
        return h.hexdigest()

    def stage(self, name: str, build, deps: list[str] = ()):
        """Return the Dataset for ``name``: reuse the checkpoint when its
        manifest matches the lineage, else run ``build()`` and persist."""
        import ray.data as rd

        lineage = self.lineage_hash(name, list(deps))
        mpath = self._manifest_path(name)
        sdir = self._stage_dir(name)
        if os.path.exists(mpath):
            with open(mpath) as f:
                manifest = json.load(f)
            if manifest.get("lineage") == lineage and os.path.isdir(sdir):
                self._lineage[name] = lineage
                self.events.append({"stage": name, "action": "reused",
                                    "rows": manifest["rows"]})
                return rd.read_parquet(sdir)
            # stale checkpoint from a different lineage/config
            shutil.rmtree(sdir, ignore_errors=True)
            os.remove(mpath)

        t0 = time.time()
        ds = build()
        tmp = sdir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        ds.write_parquet(tmp)
        if not os.path.isdir(tmp):
            # Ray writes NO files (not even the directory) for a 0-row
            # dataset; persist an empty parquet carrying the schema so
            # the checkpoint stays readable on reuse
            os.makedirs(tmp, exist_ok=True)
            import pyarrow as pa

            try:
                base = ds.schema(fetch_if_missing=True).base_schema
                if isinstance(base, pa.Schema):
                    table = base.empty_table()
                else:  # PandasBlockSchema: names + pandas dtypes
                    import pandas as pd

                    table = pa.Table.from_pandas(pd.DataFrame({
                        n: pd.Series([], dtype=t)
                        for n, t in zip(base.names, base.types)
                    }), preserve_index=False)
            except Exception:
                table = pa.table({})
            pq.write_table(table, os.path.join(tmp, "empty.parquet"))
        wall = time.time() - t0
        partitions = []
        rows = 0
        for fname in sorted(os.listdir(tmp)):
            fpath = os.path.join(tmp, fname)
            if not fname.endswith(".parquet"):
                continue
            meta = pq.read_metadata(fpath)
            partitions.append({
                "file": fname,
                "rows": meta.num_rows,
                "bytes": os.path.getsize(fpath),
            })
            rows += meta.num_rows
        shutil.rmtree(sdir, ignore_errors=True)
        os.rename(tmp, sdir)
        manifest = {
            "stage": name,
            "lineage": lineage,
            "deps": list(deps),
            "rows": rows,
            "wall_s": round(wall, 3),
            "rows_per_s": round(rows / wall, 1) if wall > 0 else None,
            "n_partitions": len(partitions),
            "partitions": partitions,
            "created_at": time.time(),
            "config_hash": self._config_hash,
        }
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f, indent=1)
        os.rename(mpath + ".tmp", mpath)
        self._lineage[name] = lineage
        self.events.append({"stage": name, "action": "built", "rows": rows,
                            "wall_s": manifest["wall_s"]})
        return rd.read_parquet(sdir)
