"""Deterministic record identifiers.

The reference keys every record by a random UUID4 (graphiti_core/nodes.py:91,
edges.py:45). A distributed, resumable pipeline needs *deterministic* ids so
re-running a shard produces byte-identical output (idempotent upsert) and so
a SQL oracle can reproduce them. We use hex md5 over a namespaced key string
— reproducible in DuckDB as ``md5('ep:' || url)`` etc.

Namespaces:
- episode  : ``ep:<url>``
- entity   : ``ent:<group_id>:<label>:<canonical_name>``
- relation : ``rel:<group_id>:<src_uuid>:<pred>:<obj_uuid>:<valid_at_us>``
- mention  : ``men:<episode_uuid>:<ordinal>``
"""

from __future__ import annotations

import hashlib

import numpy as np


def md5_id(key: str) -> str:
    return hashlib.md5(key.encode("utf-8")).hexdigest()


def episode_uuid(url: str) -> str:
    return md5_id("ep:" + url)


def entity_uuid(group_id: str, label: str, canonical_name: str) -> str:
    return md5_id(f"ent:{group_id}:{label}:{canonical_name}")


def relation_uuid(
    group_id: str, src_uuid: str, pred: str, obj_uuid: str, valid_at_us: int
) -> str:
    return md5_id(f"rel:{group_id}:{src_uuid}:{pred}:{obj_uuid}:{valid_at_us}")


def md5_id_array(keys) -> np.ndarray:
    """Vectorized md5 over an iterable of strings → object ndarray of hex."""
    return np.array([hashlib.md5(k.encode("utf-8")).hexdigest() for k in keys], dtype=object)
