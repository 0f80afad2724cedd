"""Partitioned, resumable Parquet IO with per-partition lineage manifests.

North rule: per-partition lineage manifests + triple-count metrics are
checkpointed so any failed shard resumes without recomputation. The
reference's stand-in for this is HF-Hub commit versioning
(huggingface_driver.py:394-419 ``_push_to_hub``); here it is done the way a
batch engine should: one output directory per shard, written atomically
(tmp dir + rename), plus a ``_manifest.json`` recording the input
fingerprint and row/triple counts. A re-run skips shards whose manifest
matches the input fingerprint.

Layout::

    out_dir/
      episodes/shard=0007/part-*.parquet + _manifest.json
      triples/shard=0007/...
      nodes/part-0.parquet + _manifest.json      (global stages)
      edges/part-*.parquet + _manifest.json
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST = "_manifest.json"


def shard_dir(out_dir: str, table: str, shard: int) -> str:
    return os.path.join(out_dir, table, f"shard={shard:04d}")


def manifest_matches(d: str, fingerprint: str) -> bool:
    p = os.path.join(d, MANIFEST)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            m = json.load(f)
        return m.get("fingerprint") == fingerprint and m.get("complete") is True
    except (json.JSONDecodeError, OSError):
        return False


def write_shard_atomic(table: pa.Table, d: str, fingerprint: str, metrics: dict | None = None) -> dict:
    """Write one shard directory atomically: tmp dir + rename.

    Idempotent: an existing complete shard with the same fingerprint is left
    alone; a stale/partial one is replaced."""
    if manifest_matches(d, fingerprint):
        with open(os.path.join(d, MANIFEST)) as f:
            return json.load(f)
    parent = os.path.dirname(d)
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".tmp-shard-", dir=parent)
    try:
        pq.write_table(table, os.path.join(tmp, "part-0.parquet"))
        man = {
            "fingerprint": fingerprint,
            "rows": table.num_rows,
            "written_at": time.time(),
            "complete": True,
            **(metrics or {}),
        }
        with open(os.path.join(tmp, MANIFEST), "w") as f:
            json.dump(man, f)
        if os.path.exists(d):
            shutil.rmtree(d)
        os.rename(tmp, d)
        return man
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


class ShardWriter:
    """Incremental atomic shard writer: ``write(table)`` appends one row
    group at a time to ``part-0.parquet`` inside a ``.tmp-`` dir, ``close``
    writes the manifest and renames — the same crash contract as
    write_shard_atomic (a SIGKILL leaves only an ignored ``.tmp-`` dir),
    but the shard's rows never need to be in memory at once. This is what
    lets one extract task process a 10⁶-row shard chunk-by-chunk with
    O(chunk) heap instead of O(shard)."""

    def __init__(self, d: str, fingerprint: str, schema: pa.Schema):
        self._d = d
        self._fp = fingerprint
        parent = os.path.dirname(d)
        os.makedirs(parent, exist_ok=True)
        self._tmp = tempfile.mkdtemp(prefix=".tmp-shard-", dir=parent)
        self._writer = pq.ParquetWriter(os.path.join(self._tmp, "part-0.parquet"), schema)
        self._rows = 0

    def write(self, table: pa.Table) -> None:
        if table.num_rows:
            self._writer.write_table(table)
            self._rows += table.num_rows

    def close(self, metrics: dict | None = None) -> dict:
        self._writer.close()
        man = {
            "fingerprint": self._fp,
            "rows": self._rows,
            "written_at": time.time(),
            "complete": True,
            **(metrics or {}),
        }
        with open(os.path.join(self._tmp, MANIFEST), "w") as f:
            json.dump(man, f)
        if os.path.exists(self._d):
            shutil.rmtree(self._d)
        os.rename(self._tmp, self._d)
        return man

    def abort(self) -> None:
        try:
            self._writer.close()
        finally:
            shutil.rmtree(self._tmp, ignore_errors=True)


def write_table_distributed(ds, d: str, fingerprint: str, metrics: dict | None = None) -> int:
    """Distributed sink: workers stream blocks straight to part files under
    a tmp dir (no driver-side concat), then one atomic rename + manifest.
    Phase-level resumability: a complete manifest with the same fingerprint
    skips the whole write."""
    import ray

    if manifest_matches(d, fingerprint):
        with open(os.path.join(d, MANIFEST)) as f:
            return json.load(f).get("rows", 0)
    parent = os.path.dirname(d) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".tmp-dist-", dir=parent)
    try:
        ds.write_parquet(tmp)
        rows = sum(pq.read_metadata(os.path.join(tmp, f)).num_rows for f in os.listdir(tmp) if f.endswith(".parquet"))
        man = {"fingerprint": fingerprint, "rows": rows, "written_at": time.time(), "complete": True, **(metrics or {})}
        with open(os.path.join(tmp, MANIFEST), "w") as f:
            json.dump(man, f)
        if os.path.exists(d):
            shutil.rmtree(d)
        os.rename(tmp, d)
        return rows
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def _prune_tmp(dirnames: list[str]) -> None:
    """In-place os.walk pruning: never descend into .tmp-* dirs — a
    SIGKILLed writer leaves its tmp dir behind (cleanup only runs on
    exceptions) and its partial part files must not be read as data."""
    dirnames[:] = [d for d in dirnames if not d.startswith(".tmp-")]


def rewrite_file_atomic(table: pa.Table, path: str) -> None:
    """Replace one parquet file atomically (tmp + os.replace): a crash
    mid-write leaves the original intact."""
    tmp = path + ".tmp-rw"
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise


def refresh_manifest_rows(d: str) -> None:
    """Recount a shard dir's rows from parquet footers and update its
    manifest (used after an in-place mutation like remove_episode so
    job_metrics / resume logic see true counts)."""
    p = os.path.join(d, MANIFEST)
    if not os.path.exists(p):
        return
    rows = sum(
        pq.read_metadata(os.path.join(d, fn)).num_rows
        for fn in os.listdir(d)
        if fn.endswith(".parquet")
    )
    with open(p) as f:
        m = json.load(f)
    m["rows"] = rows
    m["mutated_at"] = time.time()
    tmp = p + ".tmp-rw"
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.replace(tmp, p)


def read_table_dir(out_dir: str, table: str) -> pa.Table:
    """Read every shard of a table directory back into one Arrow table."""
    root = os.path.join(out_dir, table)
    parts = []
    for dirpath, dirnames, filenames in os.walk(root):
        _prune_tmp(dirnames)
        for fn in sorted(filenames):
            if fn.endswith(".parquet"):
                parts.append(pq.read_table(os.path.join(dirpath, fn)))
    if not parts:
        raise FileNotFoundError(f"no parquet under {root}")
    return pa.concat_tables(parts)


def read_table_dir_ds(out_dir: str, table: str, columns: list[str] | None = None):
    """Ray-Dataset reader for a (possibly shard-partitioned) table dir.

    Enumerates part FILES explicitly: reading the directory would both try
    to parse shard manifests and hive-parse ``shard=...`` dir names into a
    phantom ``shard`` column that poisons downstream schema unions."""
    import ray.data as rd

    root = os.path.join(out_dir, table)
    paths = []
    for dirpath, dirnames, filenames in os.walk(root):
        _prune_tmp(dirnames)
        for fn in sorted(filenames):
            if fn.endswith(".parquet"):
                paths.append(os.path.join(dirpath, fn))
    if not paths:
        raise FileNotFoundError(f"no parquet under {root}")
    if columns is not None:
        # an explicit column list already excludes the phantom hive column;
        # combining columns= with partitioning=None trips an UnboundLocalError
        # inside Ray 2.49's parquet datasource
        return rd.read_parquet(paths, columns=columns)
    return rd.read_parquet(paths, partitioning=None)


def completed_shards(out_dir: str, table: str, fingerprints: dict[int, str]) -> set[int]:
    done = set()
    for shard, fp in fingerprints.items():
        if manifest_matches(shard_dir(out_dir, table, shard), fp):
            done.add(shard)
    return done


BRANCHES_DIR = "_branches"


def create_branch(out_dir: str, name: str, tables: list[str] | None = None) -> dict:
    """TS9 branch: an immutable named snapshot of the graph's table dirs
    under ``out_dir/_branches/<name>/`` (reference: HF-Hub branch commits,
    huggingface_driver.py:394-419). Parquet part files are HARDLINKED, not
    copied — O(metadata) regardless of table size; manifests are copied so
    the branch carries its own lineage. In-place mutations rewrite via
    tmp+``os.replace`` (new inode), so the branch's linked files are
    untouched by later edits to main."""
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"bad branch name {name!r}")
    broot = os.path.join(out_dir, BRANCHES_DIR, name)
    if os.path.exists(broot):
        raise FileExistsError(f"branch {name!r} already exists")
    tmp = broot + ".tmp-branch"
    shutil.rmtree(tmp, ignore_errors=True)
    n_files = 0
    tables = tables or [
        t for t in sorted(os.listdir(out_dir))
        if os.path.isdir(os.path.join(out_dir, t)) and not t.startswith("_")
    ]
    try:
        for table in tables:
            troot = os.path.join(out_dir, table)
            for dirpath, dirnames, files in os.walk(troot):
                _prune_tmp(dirnames)
                rel = os.path.relpath(dirpath, out_dir)
                dest = os.path.join(tmp, rel)
                os.makedirs(dest, exist_ok=True)
                for fn in files:
                    src = os.path.join(dirpath, fn)
                    if fn.endswith(".parquet"):
                        os.link(src, os.path.join(dest, fn))
                        n_files += 1
                    elif fn == MANIFEST:
                        shutil.copy2(src, os.path.join(dest, fn))
        man = {"name": name, "created_at": time.time(), "tables": tables, "files": n_files}
        with open(os.path.join(tmp, "_branch.json"), "w") as f:
            json.dump(man, f)
        os.makedirs(os.path.dirname(broot), exist_ok=True)
        os.rename(tmp, broot)
        return man
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def list_branches(out_dir: str) -> list[dict]:
    broot = os.path.join(out_dir, BRANCHES_DIR)
    out = []
    if os.path.isdir(broot):
        for name in sorted(os.listdir(broot)):
            if ".tmp-" in name:
                # a crash between _branch.json write and os.rename leaves a
                # '<name>.tmp-branch' dir that would otherwise be listed
                # under the wrong name (mirrors _prune_tmp)
                continue
            p = os.path.join(broot, name, "_branch.json")
            if os.path.exists(p):
                with open(p) as f:
                    out.append(json.load(f))
    return out


def branch_dir(out_dir: str, name: str) -> str:
    """Root to read a branch's tables from (pass to ``read_table_dir`` /
    ``GraphStore``)."""
    d = os.path.join(out_dir, BRANCHES_DIR, name)
    if not os.path.isdir(d):
        raise FileNotFoundError(f"no branch {name!r} under {out_dir}")
    return d


def delete_branch(out_dir: str, name: str) -> None:
    shutil.rmtree(branch_dir(out_dir, name))


def job_metrics(out_dir: str) -> dict:
    """Aggregate all shard manifests into one job-level metrics dict."""
    agg: dict = {"tables": {}}
    for table in sorted(os.listdir(out_dir)) if os.path.isdir(out_dir) else []:
        troot = os.path.join(out_dir, table)
        if not os.path.isdir(troot) or table.startswith("_"):
            continue  # _branches / _journal / _index_* are not data tables
        rows = 0
        shards = 0
        for dirpath, dirnames, filenames in os.walk(troot):
            _prune_tmp(dirnames)
            if MANIFEST in filenames:
                with open(os.path.join(dirpath, MANIFEST)) as f:
                    m = json.load(f)
                rows += m.get("rows", 0)
                shards += 1
        agg["tables"][table] = {"rows": rows, "shards": shards}
    return agg
