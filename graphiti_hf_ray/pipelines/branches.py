"""Branch merge with conflict detection (SURVEY.md §2 TS9).

Reference: graphiti_hf/processing/concurrency_manager.py:263-343
(``merge_branch``), :895-925 (``_detect_conflicts``: same uuid on both
sides with different content → conflict), :927-940 (strategy dispatch).
The reference loads both branches into driver dicts; this rebuild keeps
detection distributed:

1. per-side ROW SIGNATURES — (uuid, md5-of-canonical-row, created_at) —
   computed in ``map_batches``; full rows (embedding lists etc.) never
   enter the compare shuffle;
2. one bucketed shuffle of the tagged signature rows classifies each uuid:
   target-only / source-only / identical / CONFLICT, and resolves
   conflicts per strategy;
3. the decision sets (uuids to take from source) are broadcast and applied
   as map-side filters on each branch; merged output replaces the target
   branch's table via an atomic directory swap (branch files are hardlink
   snapshots — never truncated in place, so sibling branches keep their
   inodes).

Strategies (MergeStrategy parity, concurrency_manager.py:52-58):
``manual``     — conflicts reported unresolved; target rows kept.
``target_wins``/``source_wins`` — deterministic side preference.
``timestamp``  — newer ``created_at`` wins (tie → target), the
                 timestamp_based_merge rule (:592-613).

Scale note: the broadcast decision sets are O(source-only + conflicting
uuids); when the divergence count exceeds ``GRAFT_MERGE_BROADCAST_MAX``
(default 2M uuids ≈ a few hundred MB broadcast) the apply step routes
through ``functions.joins.semi_join`` — a bucketed co-shuffle of the data
rows against the decision keys with NO driver-side set — and the conflict
report is capped at ``CONFLICT_REPORT_MAX`` rows (``conflicts_truncated``
flags the cap; counts stay exact either way).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .. import io as gio

_SIDE_TARGET, _SIDE_SOURCE = 0, 1

# divergence size above which the apply step stops broadcasting uuid sets
# and routes through the distributed semi/anti join instead
BROADCAST_MAX_DIVERGENCE = 2_000_000
# at-scale cap on the driver-side conflict report (counts stay exact)
CONFLICT_REPORT_MAX = 100_000


def _sig_batch(t: pa.Table, side: int, compare_cols: list[str]) -> pa.Table:
    """(uuid, sig, created_at, side) per row. The signature is md5 over the
    canonical JSON of the compared columns — per-row Python, acceptable for
    a maintenance op (and embeddings are excluded by default upstream)."""
    data = {c: t.column(c).to_pylist() for c in compare_cols}
    uuids = t.column("uuid").to_pylist()
    n = t.num_rows
    sigs = []
    for i in range(n):
        rec = {c: data[c][i] for c in compare_cols}
        sigs.append(hashlib.md5(json.dumps(rec, sort_keys=True, default=str).encode()).hexdigest())
    created = (
        t.column("created_at").cast(pa.int64())
        if "created_at" in t.column_names
        else pa.nulls(n, pa.int64())
    )
    return pa.table(
        {
            "uuid": pa.array(uuids, pa.string()),
            "sig": pa.array(sigs, pa.string()),
            "created_us": created,
            "side": pa.array([side] * n, pa.int8()),
        }
    )


def _classify_bucket(df: pd.DataFrame, strategy: str) -> pd.DataFrame:
    """Per-uuid decision rows: take ('target'|'source') + conflict flag."""
    out = []
    for uuid, g in df.groupby("uuid", sort=False):
        t_rows = g[g["side"] == _SIDE_TARGET]
        s_rows = g[g["side"] == _SIDE_SOURCE]
        if s_rows.empty:
            continue  # target-only → kept implicitly
        if t_rows.empty:
            out.append((uuid, "source", False, False))
            continue
        if t_rows["sig"].iloc[0] == s_rows["sig"].iloc[0]:
            continue  # identical → keep target copy
        # CONFLICT
        if strategy == "source_wins":
            take, resolved = "source", True
        elif strategy == "timestamp":
            tc = t_rows["created_us"].iloc[0]
            sc = s_rows["created_us"].iloc[0]
            newer_source = pd.notna(sc) and (pd.isna(tc) or sc > tc)
            take, resolved = ("source" if newer_source else "target"), True
        elif strategy == "target_wins":
            take, resolved = "target", True
        else:  # manual: unresolved, target kept
            take, resolved = "target", False
        out.append((uuid, take, True, resolved))
    return pd.DataFrame(out, columns=["uuid", "take", "conflict", "resolved"])


def _recover_stranded_merge(target_dir: str, table: str) -> None:
    """The swap below is NOT atomic: between ``os.rename(old, trash)`` and
    ``os.rename(tmp_new, old)`` the table directory does not exist. Recover
    any stranded state from a crash in that window before starting a new
    merge, so the branch is always readable on entry:

    - old missing + ``.merge-tmp`` present → the new table was fully written
      (the tmp dir is only renamed-from after a complete
      ``write_table_distributed``): COMPLETE the swap.
    - old missing + only ``.merge-old`` present → RESTORE the pre-merge
      table.
    - old present + leftover ``.merge-old`` → a crash after the swap but
      before cleanup: drop the trash.
    """
    old = os.path.join(target_dir, table)
    trash = os.path.join(target_dir, f"{table}.merge-old")
    tmp_new = os.path.join(target_dir, f"{table}.merge-tmp")
    if not os.path.isdir(old):
        if os.path.isdir(tmp_new):
            os.rename(tmp_new, old)
        elif os.path.isdir(trash):
            os.rename(trash, old)
    if os.path.isdir(old):
        shutil.rmtree(trash, ignore_errors=True)


def merge_branch_table(
    source_dir: str,
    target_dir: str,
    table: str,
    strategy: str = "manual",
    compare_cols: list[str] | None = None,
) -> dict:
    """Three-way merge of one table from ``source_dir`` into ``target_dir``
    (both branch roots). Returns {n_added, n_conflicts, n_resolved,
    conflicts: DataFrame(uuid, take, resolved)} and replaces the target's
    table directory with the merged rows via a write-beside + double-rename
    swap (see ``_recover_stranded_merge`` for the non-atomic window and its
    on-entry recovery)."""
    from ..stages.shuffle import bucketed_group_apply

    _recover_stranded_merge(target_dir, table)
    _recover_stranded_merge(source_dir, table)
    src = gio.read_table_dir_ds(source_dir, table)
    tgt = gio.read_table_dir_ds(target_dir, table)
    names = list(src.schema().names)
    if compare_cols is None:
        compare_cols = [c for c in names if not c.endswith("_embedding")]

    sigs = tgt.map_batches(
        lambda t: _sig_batch(t, _SIDE_TARGET, compare_cols), batch_format="pyarrow"
    ).union(
        src.map_batches(lambda t: _sig_batch(t, _SIDE_SOURCE, compare_cols), batch_format="pyarrow")
    )
    decisions_ds = bucketed_group_apply(
        sigs, ["uuid"], lambda df: _classify_bucket(df, strategy)
    ).materialize()
    n_divergent = decisions_ds.count()
    gate = int(os.environ.get("GRAFT_MERGE_BROADCAST_MAX", str(BROADCAST_MAX_DIVERGENCE)))
    conflicts_truncated = False

    if n_divergent <= gate:
        # small divergence: driver decision frame + broadcast filter sets
        decisions = decisions_ds.to_pandas()
        if decisions.empty:  # Ray's to_pandas drops columns on all-empty output
            decisions = pd.DataFrame(
                {
                    "uuid": pd.Series([], dtype=str),
                    "take": pd.Series([], dtype=str),
                    "conflict": pd.Series([], dtype=bool),
                    "resolved": pd.Series([], dtype=bool),
                }
            )

        conflicts = decisions[decisions["conflict"]][["uuid", "take", "resolved"]].reset_index(drop=True)
        take_source = set(decisions.loc[decisions["take"] == "source", "uuid"])
        drop_target = {u for u in take_source} & set(
            decisions.loc[decisions["conflict"], "uuid"]
        )  # conflicting uuids resolved to source replace the target copy
        n_added = int((~decisions["conflict"] & (decisions["take"] == "source")).sum())
        n_conflicts = int(decisions["conflict"].sum())
        n_resolved = int((decisions["conflict"] & decisions["resolved"]).sum())

        src_ref = ray.put(sorted(take_source))
        tgt_ref = ray.put(sorted(drop_target))

        def keep_target(t: pa.Table) -> pa.Table:
            drop = pa.array(ray.get(tgt_ref), pa.string())
            if len(drop) == 0:
                return t
            return t.filter(pc.invert(pc.is_in(t.column("uuid"), value_set=drop)))

        def add_source(t: pa.Table) -> pa.Table:
            want = pa.array(ray.get(src_ref), pa.string())
            return t.filter(pc.is_in(t.column("uuid"), value_set=want))

        merged = tgt.map_batches(keep_target, batch_format="pyarrow").union(
            src.map_batches(add_source, batch_format="pyarrow")
        )
    else:
        # divergence outgrew a broadcast: exact counts from a partial-count
        # pass, conflict report capped, apply via distributed semi/anti join
        from ..functions.joins import semi_join

        def part_counts(t: pa.Table) -> pa.Table:
            take_src = pc.equal(t.column("take"), "source")
            conf = t.column("conflict")
            return pa.table(
                {
                    "n_added": pa.array(
                        [pc.sum(pc.and_(pc.invert(conf), take_src)).as_py() or 0], pa.int64()
                    ),
                    "n_conflicts": pa.array([pc.sum(conf).as_py() or 0], pa.int64()),
                    "n_resolved": pa.array(
                        [pc.sum(pc.and_(conf, t.column("resolved"))).as_py() or 0], pa.int64()
                    ),
                }
            )

        cdf = decisions_ds.map_batches(part_counts, batch_format="pyarrow").to_pandas()
        n_added = int(cdf["n_added"].sum())
        n_conflicts = int(cdf["n_conflicts"].sum())
        n_resolved = int(cdf["n_resolved"].sum())

        def only_conflicts(t: pa.Table) -> pa.Table:
            return t.filter(t.column("conflict")).select(["uuid", "take", "resolved"])

        conflicts = (
            decisions_ds.map_batches(only_conflicts, batch_format="pyarrow")
            .limit(CONFLICT_REPORT_MAX)
            .to_pandas()
        )
        conflicts_truncated = n_conflicts > CONFLICT_REPORT_MAX
        if conflicts.empty:
            conflicts = pd.DataFrame(
                {
                    "uuid": pd.Series([], dtype=str),
                    "take": pd.Series([], dtype=str),
                    "resolved": pd.Series([], dtype=bool),
                }
            )

        def take_src_keys(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("take"), "source")).select(["uuid"])

        def drop_tgt_keys(t: pa.Table) -> pa.Table:
            return t.filter(
                pc.and_(t.column("conflict"), pc.equal(t.column("take"), "source"))
            ).select(["uuid"])

        merged = semi_join(
            tgt,
            decisions_ds.map_batches(drop_tgt_keys, batch_format="pyarrow"),
            "uuid",
            anti=True,
        ).union(
            semi_join(
                src,
                decisions_ds.map_batches(take_src_keys, batch_format="pyarrow"),
                "uuid",
            )
        )

    # atomic swap: write beside, rename over — sibling branches share file
    # inodes via hardlinks, so the old directory's files are never modified
    tmp_new = os.path.join(target_dir, f"{table}.merge-tmp")
    shutil.rmtree(tmp_new, ignore_errors=True)
    fp = f"merge:{strategy}:{table}"
    n_rows = gio.write_table_distributed(merged, tmp_new, fp)
    old = os.path.join(target_dir, table)
    trash = os.path.join(target_dir, f"{table}.merge-old")
    shutil.rmtree(trash, ignore_errors=True)
    os.rename(old, trash)
    os.rename(tmp_new, old)
    shutil.rmtree(trash, ignore_errors=True)

    return {
        "table": table,
        "rows": n_rows,
        "n_added": n_added,
        "n_conflicts": n_conflicts,
        "n_resolved": n_resolved,
        "conflicts": conflicts,
        "conflicts_truncated": conflicts_truncated,
    }


def merge_branch(
    out_dir: str,
    source: str,
    target: str | None = None,
    strategy: str = "manual",
    tables: tuple[str, ...] = ("nodes", "edges"),
) -> dict:
    """Merge branch ``source`` into ``target`` (None → the main tables at
    ``out_dir``), per-table. MergeResult-shaped dict (MergeResult parity,
    concurrency_manager.py:127-136)."""
    src_dir = gio.branch_dir(out_dir, source)
    tgt_dir = gio.branch_dir(out_dir, target) if target else out_dir
    results = {t: merge_branch_table(src_dir, tgt_dir, t, strategy) for t in tables}
    n_conf = sum(r["n_conflicts"] for r in results.values())
    n_res = sum(r["n_resolved"] for r in results.values())
    return {
        "success": True,
        "merged_branch": target or "main",
        "tables": results,
        "n_conflicts": n_conf,
        "n_resolved": n_res,
        "message": f"merged branch {source!r} into {target or 'main'!r} "
        f"({n_conf} conflicts, {n_res} resolved, strategy={strategy})",
    }
