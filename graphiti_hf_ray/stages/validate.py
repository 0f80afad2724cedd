"""Validation rules (SURVEY.md M9; reference episode_processor.py:526-576,
777-825 + validator.py:247-344): vectorized map_batches stage emitting a
``validation_errors`` list column plus an aggregate metrics query.

Rules (edge rows): non-empty fact, non-empty predicate name, endpoint uuids
present, temporal sanity valid_at < invalid_at when both set, group_id
matches ``^[a-zA-Z0-9_-]+$`` (helpers.py:119-142). Rule registration is a
plain dict of predicate functions (the rebuild's answer to the reference's
eval-string rules, validator.py:161-245)."""

from __future__ import annotations

import re
from typing import Callable

import pandas as pd
import pyarrow as pa

import ray

GROUP_ID_RE = re.compile(r"^[a-zA-Z0-9_-]+$")

# rule name → row-predicate over a pandas DataFrame returning bool Series
# (True = VIOLATION)
EDGE_RULES: dict[str, Callable[[pd.DataFrame], pd.Series]] = {
    "empty_fact": lambda df: df["fact"].isna() | (df["fact"].str.len() == 0),
    "empty_name": lambda df: df["name"].isna() | (df["name"].str.len() == 0),
    "missing_source": lambda df: df["source_uuid"].isna() | (df["source_uuid"].str.len() == 0),
    "missing_target": lambda df: df["target_uuid"].isna() | (df["target_uuid"].str.len() == 0),
    "temporal_inverted": lambda df: df["valid_at"].notna()
    & df["invalid_at"].notna()
    & (df["invalid_at"] <= df["valid_at"]),
    "bad_group_id": lambda df: ~df["group_id"].fillna("").map(lambda g: bool(GROUP_ID_RE.match(g))),
}


def validate_edges(edges: "ray.data.Dataset", rules=None) -> "ray.data.Dataset":
    """Adds ``validation_errors`` (comma-joined rule names, '' = clean)."""
    rules = rules or EDGE_RULES

    def f(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        errs = pd.Series([""] * len(df))
        for rule_name, pred in rules.items():
            hit = pred(df)
            errs = errs.where(~hit, errs + ("," + rule_name))
        errs = errs.str.lstrip(",")
        return t.append_column("validation_errors", pa.array(errs.tolist(), pa.string()))

    return edges.map_batches(f, batch_format="pyarrow")


def validation_metrics(edges: "ray.data.Dataset", rules=None) -> pd.DataFrame:
    """Per-rule violation counts — two-level aggregation (per-batch partial
    count → tiny driver merge), A8 metrics shape."""
    rules = rules or EDGE_RULES
    rule_names = sorted(rules.keys())

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        counts = [int(rules[r](df).sum()) for r in rule_names]
        return pa.table(
            {
                "rule": pa.array(rule_names, pa.string()),
                "n_violations": pa.array(counts, pa.int64()),
                "n_rows": pa.array([len(df)] * len(rule_names), pa.int64()),
            }
        )

    parts = edges.map_batches(partial, batch_format="pyarrow").to_pandas()
    return parts.groupby("rule", as_index=False).agg(
        n_violations=("n_violations", "sum"), n_rows=("n_rows", "sum")
    )
