"""Episode normalization (SURVEY.md S3/M8/M10).

pages (url, warc_ts, text, lang, [group_id]) → episodes table
(EpisodicNode rows: graphiti_core/nodes.py:353-363; one input row = one
episode, url→name, warc_ts→valid_at, extracted text→content,
source='text'). Stateless, fully vectorized Arrow ``map_batches`` stage.

Deterministic ids: ``uuid = md5('ep:' || url)`` (ids.py) — reproducible in
the DuckDB oracle. ``created_at`` is the injected run timestamp (the
reference uses ``utc_now()``, nodes.py:95; injecting it keeps output
idempotent across resumed runs). ``group_id`` defaults to a hash-derived
partition when the input has none (validated against ``^[a-zA-Z0-9_-]+$``,
graphiti_core/helpers.py:119-142).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from ..ids import md5_id_array

GROUP_ID_RE = re.compile(r"^[a-zA-Z0-9_-]+$")

# EpisodeType enum parity (graphiti_core/nodes.py:55-77)
EPISODE_TYPES = ("text", "message", "json")


def normalize_content(content, source: str) -> str:
    """Source-typed content normalization (nodes.py:55-77 semantics):
    ``text`` passes through; ``message`` is "speaker: utterance" lines;
    ``json`` documents are flattened to deterministic "key: value" lines
    (sorted keys) so extraction sees stable prose-like text."""
    if source == "json":
        import json as _json

        obj = _json.loads(content) if isinstance(content, str) else content

        def flat(prefix: str, v) -> list[str]:
            if isinstance(v, dict):
                out = []
                for k in sorted(v):
                    out.extend(flat(f"{prefix}.{k}" if prefix else str(k), v[k]))
                return out
            if isinstance(v, list):
                out = []
                for i, item in enumerate(v):
                    out.extend(flat(f"{prefix}[{i}]", item))
                return out
            return [f"{prefix}: {v}"]

        return "\n".join(flat("", obj))
    return content if isinstance(content, str) else str(content)


def make_episode_batch(batch: pa.Table, run_ts_us: int, source_description: str = "web crawl") -> pa.Table:
    """pages batch (with extracted ``text`` and optional ``group_id``) →
    episodes batch (schemas.EPISODES)."""
    n = batch.num_rows
    urls = batch.column("url")
    uuids = pa.array(md5_id_array("ep:" + u for u in urls.to_pylist()), pa.string())
    if "group_id" in batch.column_names:
        group = batch.column("group_id")
        bad = [g for g in group.to_pylist() if g is not None and not GROUP_ID_RE.match(g)]
        if bad:
            raise ValueError(f"invalid group_id values (helpers.py:119 rule): {bad[:5]}")
    else:
        # derive a stable partition from the url hash (2 hex chars = 256 groups)
        group = pa.array([u[:2] for u in uuids.to_pylist()], pa.string())
    run_ts = pa.array([run_ts_us] * n, pa.timestamp("us"))
    return pa.table(
        {
            "uuid": uuids,
            "name": urls,
            "content": batch.column("text"),
            "source": pa.array(["text"] * n, pa.string()),
            "source_description": pa.array([source_description] * n, pa.string()),
            "group_id": group,
            "created_at": run_ts,
            "valid_at": pc.cast(batch.column("warc_ts"), pa.timestamp("us")),
            "entity_edges": pa.array([[]] * n, pa.list_(pa.string())),
        }
    )
