"""Arrow schemas for the Graphiti-HF tabular layout.

Table layout mirrors the reference's four HF-Datasets splits
(graphiti_hf/drivers/huggingface_driver.py:245-319) plus the MENTIONS
episodic-edge table (graphiti_core/edges.py:138-151), with typed Arrow
columns instead of JSON-in-string where the schema is closed
(SURVEY.md §1.4): list columns are ``pa.list_(pa.string())``, embeddings are
fixed-size ``list_(float32, DIM)``, timestamps ``timestamp[us]`` (UTC-naive,
matching DuckDB/Arrow defaults). ``attributes`` stays a JSON string because
the reference's attribute schema is open/dynamic (graphiti_core/nodes.py:499).
"""

from __future__ import annotations

import pyarrow as pa

EMBED_DIM = 64  # deterministic hash embedder dim (tests); reference: 1024 core / 384 HF

TS = pa.timestamp("us")

# Input table (BASELINE.json input_hint): Common-Crawl-style web pages.
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", TS),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# EpisodicNode (graphiti_core/nodes.py:353-363; HF huggingface_driver.py:284-299)
EPISODES = pa.schema(
    [
        ("uuid", pa.string()),
        ("name", pa.string()),  # url
        ("content", pa.string()),  # extracted text
        ("source", pa.string()),  # EpisodeType: text|message|json
        ("source_description", pa.string()),
        ("group_id", pa.string()),
        ("created_at", TS),  # run timestamp (injected, deterministic in tests)
        ("valid_at", TS),  # warc_ts
        ("entity_edges", pa.list_(pa.string())),
    ]
)

# EntityNode (graphiti_core/nodes.py:496-501; HF huggingface_driver.py:247-261)
NODES = pa.schema(
    [
        ("uuid", pa.string()),
        ("name", pa.string()),
        ("group_id", pa.string()),
        ("labels", pa.list_(pa.string())),
        ("created_at", TS),
        ("name_embedding", pa.list_(pa.float32(), EMBED_DIM)),
        ("summary", pa.string()),
        ("attributes", pa.string()),  # JSON object
    ]
)

# EntityEdge (graphiti_core/edges.py:228-247; HF huggingface_driver.py:263-282)
EDGES = pa.schema(
    [
        ("uuid", pa.string()),
        ("source_uuid", pa.string()),
        ("target_uuid", pa.string()),
        ("name", pa.string()),  # SCREAMING_SNAKE_CASE predicate
        ("fact", pa.string()),
        ("group_id", pa.string()),
        ("created_at", TS),
        ("fact_embedding", pa.list_(pa.float32(), EMBED_DIM)),
        ("episodes", pa.list_(pa.string())),
        ("created_by", pa.string()),  # creating episode = earliest occurrence
        ("expired_at", TS),  # row invalidated at ingestion time (nullable)
        ("valid_at", TS),  # fact became true (nullable)
        ("invalid_at", TS),  # fact stopped being true (nullable)
        ("attributes", pa.string()),
    ]
)

# EpisodicEdge = MENTIONS (graphiti_core/edges.py:138-151)
EPISODIC_EDGES = pa.schema(
    [
        ("uuid", pa.string()),
        ("group_id", pa.string()),
        ("source_node_uuid", pa.string()),  # episode
        ("target_node_uuid", pa.string()),  # entity
        ("created_at", TS),
    ]
)

# CommunityNode (graphiti_core/nodes.py:664-666; HF huggingface_driver.py:301-313)
COMMUNITIES = pa.schema(
    [
        ("uuid", pa.string()),
        ("name", pa.string()),
        ("group_id", pa.string()),
        ("created_at", TS),
        ("name_embedding", pa.list_(pa.float32(), EMBED_DIM)),
        ("summary", pa.string()),
    ]
)
