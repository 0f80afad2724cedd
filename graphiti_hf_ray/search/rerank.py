"""Rerankers (SURVEY.md §2.9 / T3-T5; reference search_utils.py:1867-2010).

These operate on candidate lists (≤ hundreds of rows — every searcher uses
a 2×limit budget, search.py:205), so they are plain numpy/python in the
query layer, exactly like the reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DEFAULT_MMR_LAMBDA = 0.5  # search_utils.py:70
DEFAULT_MIN_SCORE = 0.6  # search_utils.py:69


def rrf(result_lists: list[list[str]], min_score: float = 0.0) -> list[tuple[str, float]]:
    """Reciprocal-rank fusion: score = Σ 1/(rank+1) across lists, sorted
    desc then id (search_utils.py:1867-1882)."""
    scores: dict[str, float] = {}
    for lst in result_lists:
        for rank, uid in enumerate(lst):
            scores[uid] = scores.get(uid, 0.0) + 1.0 / (rank + 1)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(u, s) for u, s in ranked if s >= min_score]


def mmr(
    candidates: list[str],
    query_vec: np.ndarray,
    cand_vecs: dict[str, np.ndarray],
    lambda_: float = DEFAULT_MMR_LAMBDA,
    k: int | None = None,
) -> list[str]:
    """Maximal-marginal-relevance (search_utils.py:1972-2010):
    greedy pick argmax λ·sim(q,c) − (1−λ)·max-sim-to-selected."""
    k = k or len(candidates)
    q = np.asarray(query_vec, np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    vecs = {}
    for u in candidates:
        v = np.asarray(cand_vecs[u], np.float64)
        vecs[u] = v / max(np.linalg.norm(v), 1e-12)
    rel = {u: float(vecs[u] @ q) for u in candidates}
    selected: list[str] = []
    remaining = list(candidates)
    while remaining and len(selected) < k:
        best, best_sc = None, -np.inf
        for u in remaining:
            div = max((float(vecs[u] @ vecs[s]) for s in selected), default=0.0)
            sc = lambda_ * rel[u] - (1 - lambda_) * div
            if sc > best_sc or (sc == best_sc and (best is None or u < best)):
                best, best_sc = u, sc
        selected.append(best)
        remaining.remove(best)
    return selected


def node_distance_rerank(
    candidates: list[str], distances: dict[str, int]
) -> list[tuple[str, float]]:
    """score = 1/distance-to-center, unreachable last
    (search_utils.py:1885-1936)."""
    scored = [
        (u, 1.0 / d if (d := distances.get(u, 0)) > 0 else (1.0 if u in distances else 0.0))
        for u in candidates
    ]
    return sorted(scored, key=lambda kv: (-kv[1], kv[0]))


def episode_mentions_rerank(
    candidates: list[str], mention_counts: pd.DataFrame
) -> list[tuple[str, float]]:
    """Rank by MENTIONS count (search_utils.py:1939-1969). ``mention_counts``
    comes from the distributed groupby in pipelines/queries (A4)."""
    m = dict(zip(mention_counts["entity_uuid"], mention_counts["n_mentions"]))
    scored = [(u, float(m.get(u, 0))) for u in candidates]
    return sorted(scored, key=lambda kv: (-kv[1], kv[0]))


class CrossEncoderStub:
    """ST7 cross-encoder reranker slot. Real models are not available in
    this container — the deterministic fake ranks by token-overlap with the
    query (injectable: replace with a GPU actor class at deploy time)."""

    def rank(self, query: str, passages: list[tuple[str, str]]) -> list[tuple[str, float]]:
        q = set(query.lower().split())
        scored = [
            (uid, round(len(q & set(p.lower().split())) / max(1, len(q)), 6)) for uid, p in passages
        ]
        return sorted(scored, key=lambda kv: (-kv[1], kv[0]))
