"""graphiti_hf_ray — a Ray-Data-native temporal knowledge-graph construction
engine with the query/data-processing capabilities of Graphiti-HF
(reference: ThatsRight-ItsTJ/Graphiti-HF, read-only at /root/reference).

Brand-new implementation, Ray-Data-first: web pages flow as a
``ray.data.Dataset`` through ``map_batches`` over zero-copy Arrow batches;
stateful stages (extractors, embedders) are actor pools; wide steps
(canonicalization, edge dedup/upsert) are explicit groupby shuffles with
documented keys and salting for head-entity skew.

Layout:
- ``schemas``    — pyarrow schemas for the Graphiti-HF table layout
  (reference: graphiti_hf/drivers/huggingface_driver.py:245-319).
- ``ids``        — deterministic md5-based record ids (SQL-reproducible).
- ``fixtures``   — deterministic synthetic web-page corpus (FIXTURES.md F1).
- ``extract``    — pinned HTML→text extractor, mention + triple extractors.
- ``stages``     — Ray Data stage implementations (episodes, embed,
  canonicalize, edges).
- ``pipelines``  — end-to-end KG construction pipeline.
- ``functions``  — large-scale training-data ops (dedup, knn, text stats,
  temporal, multimodal plumbing).
- ``search``     — read-side hybrid search (BM25, cosine, traversal, rerank).
"""

__version__ = "0.1.0"
