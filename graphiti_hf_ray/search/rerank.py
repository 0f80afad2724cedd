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


class CrossEncoderScore:
    """Actor-pool cross-encoder stage (reference
    graphiti_core/cross_encoder/bge_reranker_client.py shape): the model
    loads ONCE per actor in ``__init__``; ``__call__`` scores one batch of
    (id, passage) rows against the bound query.

    ``model_loader`` is an injectable zero-arg callable returning an object
    with ``.rank(query, [(id, passage)]) -> [(id, score)]``. ``"bge"``
    binds the real adapter (models.BGECrossEncoderClient — lazy-imports
    sentence-transformers, raising a clear error in this weights-less
    container); ``"stub"`` binds the deterministic fake.
    """

    def __init__(self, query: str, model_loader="stub"):
        self.query = query
        if callable(model_loader):
            self.model = model_loader()
        elif model_loader == "stub":
            self.model = CrossEncoderStub()
        elif model_loader == "bge":
            # real BGE adapter (models.py); raises a clear
            # NotImplementedError when sentence-transformers/weights are
            # absent — this container ships neither
            from ..models import BGECrossEncoderClient

            self.model = BGECrossEncoderClient()
        else:
            raise NotImplementedError(
                f"cross-encoder backend {model_loader!r} needs model weights not "
                "available offline; inject a model_loader callable at deploy time"
            )

    def __call__(self, t):
        import pyarrow as pa

        ids = t.column("uuid").to_pylist()
        texts = t.column("passage").to_pylist()
        ranked = dict(self.model.rank(self.query, list(zip(ids, texts))))
        return pa.table(
            {
                "uuid": pa.array(ids, pa.string()),
                "ce_score": pa.array([ranked[i] for i in ids], pa.float64()),
            }
        )


def cross_encoder_rerank_distributed(
    ds,
    query: str,
    text_col: str,
    id_col: str = "uuid",
    k: int = 10,
    model_loader="stub",
    batch_size: int = 64,
    concurrency: tuple[int, int] = (1, 4),
) -> pd.DataFrame:
    """Score a candidate Dataset with the actor-pool cross-encoder and
    return the global top-k — the distributed form of the reference's
    rerank loop (model state per actor, batched inference, tiny top-k
    shuffle)."""
    import pyarrow as pa

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"uuid": t.column(id_col), "passage": t.column(text_col)})

    scored = ds.map_batches(project, batch_format="pyarrow").map_batches(
        CrossEncoderScore,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_args=(query, model_loader),
    )
    return scored.sort(["ce_score", "uuid"], descending=[True, False]).limit(k).to_pandas()
