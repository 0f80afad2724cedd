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


def _synth_html(text: str) -> bytes:
    """Minimal HTML wrapping for text-only crawl records: one escaped
    ``<p>`` per line, so the pinned extractor (extract/html.py, frozen v1)
    round-trips the text EXACTLY (it joins title + <p> groups with \\n and
    unescapes entities). Python-level string assembly is fine here — this
    is input synthesis for records that carried no html, the same standing
    as fixtures/pages.page_html."""
    import html as _htmlmod

    body = "".join(f"<p>{_htmlmod.escape(ln, quote=False)}</p>" for ln in text.split("\n"))
    return f"<html><body>{body}</body></html>".encode("utf-8")


def pages_from_jsonl(
    jsonl_paths: list[str] | str,
    out_dir: str,
    on_bad: str = "error",
    default_lang: str = "en",
    fingerprint: str = "",
) -> list[str]:
    """Normalize newline-delimited-JSON crawl records into PAGES-schema
    Parquet under ``out_dir`` — the second bulk source format beside
    Parquet (reference parity: the JSON episode bodies the ingest routes
    accept, server/graph_service/routers/ingest.py:51-105 and
    EpisodeType.json, graphiti_core/nodes.py; here as a distributed bulk
    path that feeds ``pipelines.kg.kg_build`` unchanged).

    Accepted keys per record: ``url`` (required), ``warc_ts`` (ISO-8601
    string, an Arrow-inferred timestamp, or epoch SECONDS as int/float —
    required), ``html`` (string), ``text`` (string — at least one of
    html/text required), ``lang`` (defaults to ``default_lang``), and
    optional ``group_id`` (passed through; episode build hash-derives one
    when absent, stages/episodes.py). Records
    missing html get a minimal synthesized wrapper the pinned extractor
    round-trips exactly, so text-only corpora flow through the same
    html→text stage. ``on_bad``: ``"error"`` (default) raises on the first
    invalid record, ``"drop"`` filters them (the written manifest's row
    count is the surviving total).

    Returns the ``pages_paths`` list to hand to ``kg_build`` /
    ``extract_phase``. One streaming pass: read_json → vectorized
    normalize (only html synthesis touches Python strings, and only for
    rows that carried no html) → distributed Parquet sink with the usual
    atomic manifest (same-fingerprint re-runs skip the write)."""
    import hashlib

    import pyarrow.compute as pc

    import ray.data as rd

    from .schemas import PAGES

    if on_bad not in ("error", "drop"):
        raise ValueError(f"on_bad must be 'error' or 'drop', got {on_bad!r}")
    paths = [jsonl_paths] if isinstance(jsonl_paths, str) else sorted(jsonl_paths)
    if not fingerprint:
        h = hashlib.md5()
        for p in paths:
            h.update(f"{os.path.basename(p)}:{os.path.getsize(p)}\n".encode())
        fingerprint = "jsonl:" + h.hexdigest()

    ds = rd.read_json(paths)
    # group_id presence is decided ONCE from the unified input schema (one
    # sampled block): per-batch detection would let files with and without
    # the key produce different output schemas in one run, and an all-null
    # pass-through would silently defeat the episode stage's hash-derived
    # default — with the key present, null group_ids are invalid records
    has_group = "group_id" in (ds.schema().names or [])

    def norm(t: pa.Table) -> pa.Table:
        n = t.num_rows
        names = set(t.column_names)

        def col(name: str, typ) -> pa.ChunkedArray:
            if name in names:
                c = t.column(name)
                return c if c.type == typ else c.cast(typ)
            return pa.chunked_array([pa.nulls(n, typ)])

        url = col("url", pa.string())
        if "warc_ts" in names:
            ts = t.column("warc_ts")
            if pa.types.is_timestamp(ts.type):
                ts_us = ts.cast(pa.timestamp("us"))
            elif pa.types.is_integer(ts.type) or pa.types.is_floating(ts.type):
                # epoch SECONDS by contract (sub-second floats keep µs)
                ts_us = pc.round(pc.multiply(ts.cast(pa.float64()), 1_000_000.0)).cast(
                    pa.int64()
                ).cast(pa.timestamp("us"))
            else:
                ts_us = ts.cast(pa.string()).cast(pa.timestamp("us"))  # ISO-8601
        else:
            ts_us = pa.chunked_array([pa.nulls(n, pa.timestamp("us"))])
        html_s = col("html", pa.string())
        text = col("text", pa.string())
        lang = pc.fill_null(col("lang", pa.string()), default_lang)

        group = col("group_id", pa.string()) if has_group else None
        ok = pc.and_kleene(
            pc.and_kleene(pc.is_valid(url), pc.is_valid(ts_us)),
            pc.or_kleene(pc.is_valid(html_s), pc.is_valid(text)),
        )
        if group is not None:
            ok = pc.and_kleene(ok, pc.is_valid(group))
        n_bad = n - pc.sum(ok.cast(pa.int64())).as_py()
        if n_bad:
            if on_bad == "error":
                raise ValueError(
                    f"{n_bad} invalid jsonl record(s): url and warc_ts are "
                    "required, plus at least one of html/text, plus "
                    "group_id when any input file carries that key "
                    "(on_bad='drop' filters them instead)"
                )
            url, ts_us, html_s, text, lang = (
                c.filter(ok) for c in (url, ts_us, html_s, text, lang)
            )
            group = group.filter(ok) if group is not None else None
        # html: pass through as utf-8 bytes; synthesize ONLY where absent
        html_b = html_s.cast(pa.binary()).combine_chunks()
        need = pc.is_null(html_b)
        if pc.any(need).as_py():
            idx = pc.indices_nonzero(need).to_numpy(zero_copy_only=False)
            texts = text.combine_chunks()
            vals = html_b.to_pylist()
            for i in idx:
                # text is guaranteed valid here: a row with neither
                # html nor text was dropped/raised above
                vals[int(i)] = _synth_html(texts[int(i)].as_py())
            html_b = pa.array(vals, pa.binary())
        out = pa.table(
            {
                "url": url,
                "warc_ts": ts_us,
                "html": html_b,
                "text": pc.fill_null(text, ""),
                "lang": lang,
            },
            schema=PAGES,
        )
        if group is not None:
            out = out.append_column("group_id", group.cast(pa.string()))
        return out

    write_table_distributed(ds.map_batches(norm, batch_format="pyarrow"), out_dir, fingerprint)
    return [out_dir]


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
