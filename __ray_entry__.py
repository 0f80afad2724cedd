"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG-construction pipeline on sf0.001;
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent SQL (same
column names). KG oracles are generated from the SAME constants module as
the fixture generator (graphiti_hf_ray/fixtures/pages.py), so they cannot
drift from the Ray implementation.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os as _os
import sys as _sys
from collections.abc import Callable
from typing import Any

# the driver may import this module from any cwd — make the package findable
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

from graphiti_hf_ray.fixtures import pages as _P
from graphiti_hf_ray.functions.textclean import PII_PATTERNS as _PII_PATTERNS
from graphiti_hf_ray.functions.textstats import _LANG_PROFILES, STOPWORDS as _STOPWORDS
from graphiti_hf_ray.pipelines.queries import QUERIES as _QUERIES


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: pages → extract →
    triples → canonicalize → bi-temporal edges. Returns the edges table."""
    return _QUERIES["q22_kg_edges"]("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(_QUERIES)


def _sql_stoplist() -> str:
    return "[" + ",".join(f"'{w}'" for w in _STOPWORDS) + "]"


def oracle_sql() -> dict[str, str]:
    cte = _P.sql_canonical_cte()
    pages_sub = _P.sql_pages()
    sql = {
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   round(sum(l_quantity) / count(*), 4) AS avg_qty,
                   round(sum(l_extendedprice) / count(*), 4) AS avg_price,
                   round(sum(l_discount) / count(*), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem GROUP BY 1, 2
        """,
        "q02_top_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "q03_customer_order_stats": """
            SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
            FROM orders GROUP BY 1
        """,
        "q04_region_rollup": """
            SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1
        """,
        "q05_part_types": """
            SELECT p_type, count(*) AS n_parts, round(sum(p_retailprice) / count(*), 4) AS avg_retail
            FROM part GROUP BY 1
        """,
        "q06_revenue_filter": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, count(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
        """,
        "q07_latest_order": """
            SELECT o_custkey, latest_orderkey FROM (
                SELECT o_custkey, o_orderkey AS latest_orderkey,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                FROM orders
            ) WHERE rn = 1
        """,
        "q08_events_daily": """
            SELECT event_type, epoch_us(ts) // 1000000 // 86400 AS bucket,
                   count(*) AS n, round(sum(value), 2) AS total
            FROM events GROUP BY 1, 2
        """,
        "q09_events_pit": """
            SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
            FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00' GROUP BY 1
        """,
        "q10_events_invalidate": """
            SELECT event_id,
                   lead(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS valid_until
            FROM events
        """,
        "q11_events_sessions": """
            SELECT user_id, count(*) AS n_events,
                   CAST(1 + coalesce(sum(CASE WHEN diff > 1800000000 THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS n_sessions
            FROM (
                SELECT user_id,
                       epoch_us(ts) - lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id) AS diff
                FROM events
            ) GROUP BY user_id
        """,
        "q12_dedup_exact": """
            -- coalesce mirrors the engine's nulls-hash-as-empty policy
            -- (md5_fp_batch); no-op on the null-free test tables
            SELECT md5(coalesce(text, '')) AS fingerprint, min(doc_id) AS keep_doc_id,
                   count(*) AS n_dups
            FROM documents GROUP BY coalesce(text, '')
        """,
        # PII columns: the fixture text has zero digits, so the scrub probe
        # appends the same deterministic doc_id-derived contact suffix on
        # both sides (email + ipv4 — the lookaround-free PII subset RE2 can
        # express); counts AND the scrubbed-text md5 must match, in the
        # engine's application order (email first, then ipv4 over the
        # already-scrubbed text). Patterns come from textclean.PII_PATTERNS
        # — one constant, both sides.
        # q13: fused doc profile. Repetition probes (Gopher duplicate-text
        # rules, token form) are INTEGER numerators over the n_chars
        # denominator: top2gram_chars = count(most frequent 2-gram,
        # lex-min tie-break) × length(gram); dup5gram_chars = Σ count ×
        # length over distinct 5-grams occurring ≥ 2 times.
        "q13_doc_profile": f"""
            WITH base AS (
                SELECT doc_id, text, string_split(text, chr(32)) AS t,
                       text || ' Contact doc' || doc_id || '@example.org or 192.168.'
                            || (doc_id % 256) || '.' || (doc_id % 100) || ' now.' AS ptext
                FROM documents
            ),
            g2 AS (
                SELECT doc_id, unnest(list_transform(range(1, len(t)),
                       i -> t[i] || chr(32) || t[i+1])) AS g
                FROM base WHERE len(t) >= 2
            ),
            c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
            top2 AS (
                SELECT doc_id, c * length(g) AS top2gram_chars
                FROM (SELECT doc_id, g, c, row_number() OVER
                        (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn FROM c2)
                WHERE rn = 1
            ),
            g5 AS (
                SELECT doc_id, unnest(list_transform(range(1, len(t) - 3),
                       i -> t[i] || chr(32) || t[i+1] || chr(32) || t[i+2] || chr(32)
                            || t[i+3] || chr(32) || t[i+4])) AS g
                FROM base WHERE len(t) >= 5
            ),
            c5 AS (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY 1, 2),
            d5 AS (
                SELECT doc_id, CAST(sum(c * length(g)) AS BIGINT) AS dup5gram_chars
                FROM c5 WHERE c >= 2 GROUP BY 1
            ),
            -- unigram surprisal (quality.unigram_surprisal): bits(t) =
            -- floor(log2(N // c(t))) = length(bin(N // c)) - 1, doc score
            -- sums bits over tokens WITH multiplicity — integer-exact
            tokq AS (SELECT doc_id, unnest(t) AS tk FROM base),
            ucnt AS (SELECT tk, count(*) AS c FROM tokq GROUP BY tk),
            utot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM ucnt),
            usc AS (
                SELECT tokq.doc_id,
                       CAST(sum(length(bin(CAST((SELECT n FROM utot) // c AS BIGINT))) - 1)
                            AS BIGINT) AS unigram_surprisal_bits
                FROM tokq JOIN ucnt USING (tk) GROUP BY 1
            )
            SELECT b.doc_id,
                   length(text) AS n_chars,
                   len(t) AS n_tokens,
                   len(list_distinct(t)) AS n_uniq_tokens,
                   len(list_filter(t, x -> list_contains({_sql_stoplist()}, x))) AS n_stopwords,
                   CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS sum_token_len,
                   (len(t) BETWEEN 50 AND 100000
                    AND 3 * len(t) <= list_sum(list_transform(t, x -> length(x)))
                    AND list_sum(list_transform(t, x -> length(x))) <= 10 * len(t)
                    AND 100 * len(list_filter(t, x -> list_contains({_sql_stoplist()}, x))) >= 2 * len(t)
                   ) AS passes_gopher,
                   md5(text) AS fingerprint,
                   len(regexp_extract_all(ptext, '{_PII_PATTERNS["email"]}')) AS n_pii_email,
                   len(regexp_extract_all(
                       regexp_replace(ptext, '{_PII_PATTERNS["email"]}', '<EMAIL>', 'g'),
                       '{_PII_PATTERNS["ipv4"]}')) AS n_pii_ipv4,
                   md5(regexp_replace(
                       regexp_replace(ptext, '{_PII_PATTERNS["email"]}', '<EMAIL>', 'g'),
                       '{_PII_PATTERNS["ipv4"]}', '<IPV4>', 'g')) AS pii_fingerprint,
                   COALESCE(top2.top2gram_chars, 0) AS top2gram_chars,
                   COALESCE(d5.dup5gram_chars, 0) AS dup5gram_chars,
                   usc.unigram_surprisal_bits
            FROM base b
            LEFT JOIN top2 ON top2.doc_id = b.doc_id
            LEFT JOIN d5 ON d5.doc_id = b.doc_id
            JOIN usc ON usc.doc_id = b.doc_id
        """,
        # q16: brute-force top-10 + the persisted trained-IVF sidecar read
        # back at FULL probe (exact — every list read), both against the
        # same exact-scan SQL.
        "q16_knn": """
            WITH topk AS (
                SELECT vec_id FROM embeddings
                ORDER BY list_cosine_similarity(embedding,
                         (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC, vec_id
                LIMIT 10
            )
            SELECT 'brute' AS kind, vec_id FROM topk
            UNION ALL
            SELECT 'ivf', vec_id FROM topk
        """,
        # q17: exact cosine pairs + fused semantic-dedup probe — kind='root'
        # rows are the connected-component assignment over the pair graph
        # (node → smallest reachable vec_id, the semantic_dedup_rows
        # cluster-winner basis), oracled by a recursive reachability CTE.
        "q17_embedding_neardup": """
            WITH RECURSIVE thr AS (
                SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
            ),
            sym AS (SELECT vec_a AS a, vec_b AS b FROM thr
                    UNION ALL SELECT vec_b, vec_a FROM thr),
            reach AS (
                SELECT a AS node, a AS r FROM sym
                UNION
                SELECT s.a AS node, reach.r FROM reach JOIN sym s ON s.b = reach.node
            )
            SELECT 'pair' AS kind, vec_a, vec_b FROM thr
            UNION ALL
            SELECT 'root' AS kind, node AS vec_a, min(r) AS vec_b FROM reach GROUP BY node
        """,
        "q18_ngram_jaccard": """
            WITH toks AS (SELECT doc_id, string_split(text, chr(32)) AS t FROM documents),
            sh AS (
                SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
                       i -> t[i] || chr(32) || t[i+1] || chr(32) || t[i+2])) AS s
                FROM toks WHERE len(t) >= 3
                UNION ALL
                SELECT doc_id, text AS s FROM documents WHERE len(string_split(text, chr(32))) < 3
            ),
            dsh AS (SELECT DISTINCT doc_id, s FROM sh),
            sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY 1),
            pairs AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                FROM dsh a JOIN dsh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT doc_a, doc_b
            FROM pairs p JOIN sizes sa ON sa.doc_id = p.doc_a JOIN sizes sb ON sb.doc_id = p.doc_b
            WHERE p.inter * 1.0 / (sa.n + sb.n - p.inter) >= 0.05
        """,
        # q19: MinHash-LSH output is exact-Jaccard-verified; at 16 bands × 4
        # rows the per-pair miss probability at fixture similarities is
        # < 1e-6, so the exact 5-token-shingle Jaccard SQL is the oracle.
        # PRECONDITION: no band bucket exceeds MAX_BUCKET_DOCS (the engine
        # counts drops in dedup.DROP_METRICS; nonzero ⇒ this exact oracle no
        # longer applies for the dropped docs and the compare SHOULD fail).
        # Fused probe: kind='root' rows are the connected-component
        # assignment over the pair graph (node → smallest reachable doc_id,
        # the fuzzy_dedup_rows cluster-winner basis), oracled by a recursive
        # reachability CTE over the same exact-Jaccard pairs.
        "q19_minhash_neardup": """
            WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, chr(32)) AS t FROM documents),
            sh AS (
                SELECT doc_id, unnest(list_transform(range(1, len(t) - 3),
                       i -> t[i] || chr(32) || t[i+1] || chr(32) || t[i+2] || chr(32)
                            || t[i+3] || chr(32) || t[i+4])) AS s
                FROM toks WHERE len(t) >= 5
                UNION ALL
                SELECT doc_id, text AS s FROM documents WHERE len(string_split(text, chr(32))) < 5
            ),
            dsh AS (SELECT DISTINCT doc_id, s FROM sh),
            sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY 1),
            pairs AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                FROM dsh a JOIN dsh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            thr AS (
                SELECT doc_a, doc_b
                FROM pairs p JOIN sizes sa ON sa.doc_id = p.doc_a JOIN sizes sb ON sb.doc_id = p.doc_b
                WHERE p.inter * 1.0 / (sa.n + sb.n - p.inter) >= 0.3
            ),
            sym AS (SELECT doc_a AS a, doc_b AS b FROM thr
                    UNION ALL SELECT doc_b, doc_a FROM thr),
            reach AS (
                SELECT a AS node, a AS r FROM sym
                UNION
                SELECT s.a AS node, reach.r FROM reach JOIN sym s ON s.b = reach.node
            )
            SELECT 'pair' AS kind, doc_a, doc_b FROM thr
            UNION ALL
            SELECT 'root' AS kind, node AS doc_a, min(r) AS doc_b FROM reach GROUP BY node
        """,
        # q19b: SimHash at Hamming <= 3 with 4×16-bit bands is EXACT
        # (pigeonhole), so the all-pairs simhash reconstruction below is an
        # exact oracle. Bit b of a token's hash = bit (b%8) of md5-digest
        # byte (b//8) — the little-endian uint64 the engine uses.
        # PRECONDITION: no band bucket exceeds MAX_BUCKET_DOCS (drops are
        # counted via simhash_pairs(metrics_out=...); nonzero voids this
        # exactness claim for the dropped docs).
        "q19b_simhash_neardup": """
            WITH tok AS (SELECT doc_id, unnest(string_split(text, chr(32))) AS tk FROM documents),
            th AS (SELECT doc_id, md5(tk) AS h FROM tok),
            bits AS (
                SELECT doc_id, b.b AS b,
                       sum(CASE WHEN (CAST(
                             (strpos('0123456789abcdef', substr(h, 2*(b.b//8)+1, 1))-1)*16
                           + (strpos('0123456789abcdef', substr(h, 2*(b.b//8)+2, 1))-1)
                         AS BIGINT) >> CAST(b.b % 8 AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END) AS acc
                FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS b) b
                GROUP BY 1, 2
            ),
            sim AS (SELECT doc_id, b, CASE WHEN acc > 0 THEN 1 ELSE 0 END AS bit FROM bits),
            ham AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       sum(CASE WHEN a.bit != b.bit THEN 1 ELSE 0 END) AS hamming
                FROM sim a JOIN sim b ON a.b = b.b AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming FROM ham WHERE hamming <= 3
        """,
        "q20_kg_episodes": f"""
            SELECT md5('ep:' || url) AS uuid, url AS name, text AS content, group_id, warc_ts AS valid_at
            FROM ({pages_sub}) p
        """,
        "q21_kg_nodes": f"""
            WITH {cte}
            SELECT DISTINCT md5('ent:' || group_id || ':' || label || ':' || canon_name) AS uuid,
                   canon_name AS name, group_id, label AS label,
                   label || ' entity: ' || canon_name AS summary
            FROM canon
        """,
        "q22_kg_edges": f"""
            WITH {cte},
            merged AS (
                SELECT group_id, subj_uuid, pred, obj_uuid,
                       min(valid_at) AS valid_at,
                       min(epoch_us) AS epoch_us,
                       min_by(fact, epoch_us) AS fact,
                       count(*) AS n_occurrences,
                       count(DISTINCT episode_uuid) AS n_episodes
                FROM gold_canon GROUP BY 1, 2, 3, 4
            ),
            swept AS (
                SELECT *, CASE WHEN pred IN {_P.SQL_FUNCTIONAL_IN} THEN
                       lead(valid_at) OVER (PARTITION BY group_id, pred, obj_uuid
                                            ORDER BY valid_at, subj_uuid)
                       ELSE NULL END AS invalid_at
                FROM merged
            )
            SELECT md5('rel:' || group_id || ':' || subj_uuid || ':' || pred || ':' || obj_uuid || ':' || epoch_us) AS uuid,
                   subj_uuid AS source_uuid, pred AS name, obj_uuid AS target_uuid,
                   fact, group_id, valid_at, invalid_at, n_occurrences, n_episodes
            FROM swept
        """,
        "q23_kg_mentions": f"""
            WITH {cte}
            SELECT DISTINCT episode_uuid AS source_node_uuid, entity_uuid AS target_node_uuid FROM (
                SELECT episode_uuid, subj_uuid AS entity_uuid FROM gold_canon
                UNION ALL
                SELECT episode_uuid, obj_uuid FROM gold_canon
            )
        """,
        "q24_kg_communities": f"""
            WITH RECURSIVE {cte},
            merged AS (SELECT DISTINCT group_id, subj_uuid AS a, obj_uuid AS b FROM gold_canon),
            und AS (SELECT group_id, a, b FROM merged UNION SELECT group_id, b AS a, a AS b FROM merged),
            reach AS (
                SELECT group_id, a AS node, a AS peer FROM und
                UNION
                SELECT r.group_id, r.node, u.b AS peer
                FROM reach r JOIN und u ON u.group_id = r.group_id AND u.a = r.peer
            )
            SELECT group_id, md5('com:' || group_id || ':' || root) AS community_uuid, node AS member_uuid
            FROM (SELECT group_id, node, min(peer) AS root FROM reach GROUP BY 1, 2)
        """,
        "q25_mention_counts": f"""
            WITH {cte}
            SELECT entity_uuid, count(*) AS n_mentions FROM (
                SELECT DISTINCT episode_uuid, entity_uuid FROM (
                    SELECT episode_uuid, subj_uuid AS entity_uuid FROM gold_canon
                    UNION ALL
                    SELECT episode_uuid, obj_uuid FROM gold_canon
                )
            ) GROUP BY 1
        """,
        "q26_kg_bfs": f"""
            WITH {cte},
            merged AS (SELECT DISTINCT group_id, subj_uuid AS a, obj_uuid AS b FROM gold_canon),
            seed AS (
                SELECT min(md5('ent:' || group_id || ':' || label || ':' || canon_name)) AS s
                FROM canon WHERE group_id = 'g0'
            ),
            hop1 AS (
                SELECT DISTINCT m.b AS uuid FROM merged m, seed WHERE m.a = seed.s AND m.group_id = 'g0'
            ),
            hop2 AS (
                SELECT DISTINCT m.b AS uuid FROM merged m JOIN hop1 h ON m.a = h.uuid WHERE m.group_id = 'g0'
            )
            SELECT uuid, 1 AS depth FROM hop1 WHERE uuid != (SELECT s FROM seed)
            UNION ALL
            SELECT uuid, 2 AS depth FROM hop2
            WHERE uuid NOT IN (SELECT uuid FROM hop1) AND uuid != (SELECT s FROM seed)
        """,
        "q27_kg_pit_edges": f"""
            WITH {cte},
            merged AS (
                SELECT group_id, subj_uuid, pred, obj_uuid,
                       min(valid_at) AS valid_at, min(epoch_us) AS epoch_us
                FROM gold_canon GROUP BY 1, 2, 3, 4
            ),
            swept AS (
                SELECT *, CASE WHEN pred IN {_P.SQL_FUNCTIONAL_IN} THEN
                       lead(valid_at) OVER (PARTITION BY group_id, pred, obj_uuid
                                            ORDER BY valid_at, subj_uuid)
                       ELSE NULL END AS invalid_at
                FROM merged
            )
            SELECT md5('rel:' || group_id || ':' || subj_uuid || ':' || pred || ':' || obj_uuid || ':' || epoch_us) AS uuid
            FROM swept
            WHERE valid_at <= TIMESTAMP '2024-06-01' AND (invalid_at IS NULL OR invalid_at > TIMESTAMP '2024-06-01')
        """,
        "q28_kg_validation": f"""
            WITH {cte},
            merged AS (
                SELECT group_id, subj_uuid, pred, obj_uuid, min(valid_at) AS valid_at,
                       min_by(fact, epoch_us) AS fact
                FROM gold_canon GROUP BY 1, 2, 3, 4
            ),
            swept AS (
                SELECT *, CASE WHEN pred IN {_P.SQL_FUNCTIONAL_IN} THEN
                       lead(valid_at) OVER (PARTITION BY group_id, pred, obj_uuid
                                            ORDER BY valid_at, subj_uuid)
                       ELSE NULL END AS invalid_at
                FROM merged
            ),
            n AS (SELECT count(*) AS n_rows FROM swept)
            SELECT * FROM (
                SELECT 'bad_group_id' AS rule, count(*) FILTER (WHERE NOT regexp_matches(group_id, '^[a-zA-Z0-9_-]+$')) AS n_violations, (SELECT n_rows FROM n) AS n_rows FROM swept
                UNION ALL
                SELECT 'empty_fact', count(*) FILTER (WHERE fact IS NULL OR length(fact) = 0), (SELECT n_rows FROM n) FROM swept
                UNION ALL
                SELECT 'empty_name', count(*) FILTER (WHERE pred IS NULL OR length(pred) = 0), (SELECT n_rows FROM n) FROM swept
                UNION ALL
                SELECT 'missing_source', count(*) FILTER (WHERE subj_uuid IS NULL OR length(subj_uuid) = 0), (SELECT n_rows FROM n) FROM swept
                UNION ALL
                SELECT 'missing_target', count(*) FILTER (WHERE obj_uuid IS NULL OR length(obj_uuid) = 0), (SELECT n_rows FROM n) FROM swept
                UNION ALL
                SELECT 'temporal_inverted', count(*) FILTER (WHERE valid_at IS NOT NULL AND invalid_at IS NOT NULL AND invalid_at <= valid_at), (SELECT n_rows FROM n) FROM swept
            )
        """,
        "q29_multimodal_features": """
            SELECT 'm' || doc_id AS media_id, md5(text) AS payload_md5,
                   octet_length(encode(text)) AS n_bytes
            FROM documents
        """,
        "q30_kg_duplicate_edges": f"""
            WITH {cte},
            surfaces AS (
                SELECT DISTINCT o.group_id, o.label, o.surface, c.canon_name,
                       md5('ent:' || o.group_id || ':' || o.label || ':' || c.canon_name) AS canon_uuid
                FROM occ o JOIN canon c
                  ON c.group_id = o.group_id AND c.label = o.label AND c.key = o.key
            ),
            alias AS (SELECT * FROM surfaces WHERE surface != canon_name)
            SELECT md5('dup:' || src || ':' || canon_uuid) AS uuid,
                   src AS source_uuid, surface AS source_name,
                   canon_uuid AS target_uuid, canon_name AS target_name, group_id
            FROM (
                SELECT *, md5('ent:' || group_id || ':' || label || ':' || surface) AS src FROM alias
            )
        """,
        "q31_episode_window": f"""
            SELECT md5('ep:' || url) AS uuid,
                   least(row_number() OVER (PARTITION BY group_id
                                            ORDER BY warc_ts, md5('ep:' || url)) - 1, 3) AS n_prev
            FROM ({pages_sub}) p
        """,
        "q32_pagination": f"""
            WITH {cte},
            merged AS (
                SELECT group_id, subj_uuid, pred, obj_uuid, min(epoch_us) AS epoch_us
                FROM gold_canon GROUP BY 1, 2, 3, 4
            ),
            ids AS (
                SELECT md5('rel:' || group_id || ':' || subj_uuid || ':' || pred || ':' || obj_uuid || ':' || epoch_us) AS uuid
                FROM merged
            )
            SELECT uuid FROM ids WHERE uuid < '80000000000000000000000000000000'
            ORDER BY uuid DESC LIMIT 20
        """,
        "q33_snapshot_counts": f"""
            WITH {cte},
            merged AS (
                SELECT group_id, subj_uuid, pred, obj_uuid, min(valid_at) AS valid_at
                FROM gold_canon GROUP BY 1, 2, 3, 4
            ),
            swept AS (
                SELECT *, CASE WHEN pred IN {_P.SQL_FUNCTIONAL_IN} THEN
                       lead(valid_at) OVER (PARTITION BY group_id, pred, obj_uuid
                                            ORDER BY valid_at, subj_uuid)
                       ELSE NULL END AS invalid_at
                FROM merged
            ),
            live AS (
                SELECT * FROM swept
                WHERE valid_at <= TIMESTAMP '2024-01-20'
                  AND (invalid_at IS NULL OR invalid_at > TIMESTAMP '2024-01-20')
            )
            SELECT (SELECT count(*) FROM live) AS n_edges,
                   (SELECT count(*) FROM (
                       SELECT subj_uuid AS u FROM live UNION SELECT obj_uuid FROM live
                   )) AS n_nodes
        """,
    }

    def _sql_list(words) -> str:
        return "[" + ",".join(f"'{w}'" for w in sorted(words)) + "]"

    lang_counts = ", ".join(
        f"len(list_filter(list_distinct(string_split(lower(text), chr(32))), "
        f"w -> list_contains({_sql_list(prof)}, w))) AS n_{lang}"
        for lang, prof in sorted(_LANG_PROFILES.items())
        if prof
    )
    # q36's fused decontamination probe mirrors pipelines/queries
    # ._BENCH_DOCS/_BENCH_N: benchmark suite = docs 0..4, 8-token grams,
    # count = collision POSITIONS (every window of the doc whose gram is in
    # the benchmark set), so the oracle explodes windows and joins against
    # the distinct benchmark grams.
    # q36's fused quality probe mirrors functions/quality.HashedNgramQuality
    # with the stub weights: feature = whitespace unigram|bigram, bucket =
    # int(md5(f)[:8],16) % 65536, weight = int(md5('w:'+b)[:4],16) - 32768,
    # logit = sum over features WITH multiplicity.
    hexn = lambda col, k: " + ".join(  # noqa: E731 — local SQL fragment builder
        f"(strpos('0123456789abcdef', substr({col}, {i + 1}, 1)) - 1) * {16 ** (k - 1 - i)}"
        for i in range(k)
    )
    sql["q36_langid"] = f"""
        WITH langid AS (
          SELECT doc_id,
                 CASE WHEN m = 0 THEN 'und'
                      WHEN n_de = m THEN 'de'
                      WHEN n_en = m THEN 'en'
                      WHEN n_es = m THEN 'es'
                      ELSE 'fr' END AS lang_pred
          FROM (
              SELECT doc_id, greatest(n_de, n_en, n_es, n_fr) AS m, n_de, n_en, n_es, n_fr
              FROM (SELECT doc_id, {lang_counts} FROM documents)
          )
        ),
        toks AS (
          SELECT doc_id, regexp_split_to_array(text, ' ') AS a,
                 len(regexp_split_to_array(text, ' ')) AS n
          FROM documents
        ),
        grams AS (
          SELECT doc_id,
                 array_to_string(a[i+1 : i+8], ' ') AS g
          FROM (SELECT doc_id, a,
                       unnest(generate_series(0, n - 8)) AS i
                FROM toks WHERE n >= 8)
        ),
        bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 5),
        hits AS (
          SELECT grams.doc_id, count(*) AS n_contaminated_ngrams
          FROM grams JOIN bench USING (g) GROUP BY grams.doc_id
        ),
        feats AS (
          SELECT doc_id, unnest(a) AS f FROM toks
          UNION ALL
          SELECT doc_id, a[i+1] || ' ' || a[i+2] AS f
          FROM (SELECT doc_id, a, unnest(generate_series(0, n - 2)) AS i
                FROM toks WHERE n >= 2)
        ),
        fb AS (
          SELECT doc_id, ({hexn("hh", 8)}) % 65536 AS b
          FROM (SELECT doc_id, md5(f) AS hh FROM feats)
        ),
        wv AS (
          SELECT b, ({hexn("wh", 4)}) - 32768 AS wt
          FROM (SELECT b, md5('w:' || CAST(b AS VARCHAR)) AS wh
                FROM (SELECT DISTINCT b FROM fb))
        ),
        qsc AS (
          SELECT fb.doc_id, CAST(sum(wt) AS BIGINT) AS quality_logit,
                 count(*) AS n_quality_feats
          FROM fb JOIN wv USING (b) GROUP BY 1
        )
        SELECT l.doc_id, l.lang_pred,
               coalesce(h.n_contaminated_ngrams, 0) AS n_contaminated_ngrams,
               q.quality_logit, q.n_quality_feats
        FROM langid l LEFT JOIN hits h ON l.doc_id = h.doc_id
        JOIN qsc q ON l.doc_id = q.doc_id
    """

    sql["q34_event_overlaps"] = """
        WITH iv AS (
            SELECT user_id, event_type, event_id,
                   epoch_us(ts) AS start_us,
                   epoch_us(ts) + (CAST(floor(value) AS BIGINT) + 1) * 60000000 AS end_us
            FROM events
        ),
        marked AS (
            SELECT user_id, event_type,
                   CASE WHEN start_us < max(end_us) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY start_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) THEN 1 ELSE 0 END AS c
            FROM iv
        )
        SELECT user_id, event_type, CAST(sum(c) AS BIGINT) AS n_overlaps, count(*) AS n_edges
        FROM marked GROUP BY 1, 2
    """

    terms = ["data", "query", "spark"]
    term_values = ", ".join(f"('{t}')" for t in terms)
    sql["q35_bm25_docs"] = f"""
        WITH toks AS (SELECT doc_id, string_split(lower(text), chr(32)) AS t FROM documents),
        stats AS (SELECT count(*) AS n_docs, sum(len(t)) * 1.0 / count(*) AS avgdl FROM toks),
        df_ AS (
            SELECT d.term, count(*) FILTER (WHERE list_contains(toks.t, d.term)) AS df
            FROM (VALUES {term_values}) d(term) CROSS JOIN toks GROUP BY 1
        ),
        idf AS (SELECT term, ln((s.n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf FROM df_, stats s),
        persco AS (
            SELECT toks.doc_id, i.idf,
                   len(list_filter(toks.t, x -> x = i.term)) AS f,
                   len(toks.t) AS dl
            FROM toks CROSS JOIN idf i
        )
        SELECT doc_id FROM (
            SELECT p.doc_id,
                   round(sum(CASE WHEN p.f > 0
                       THEN p.idf * p.f * 2.5 / (p.f + 1.5 * (0.25 + 0.75 * p.dl / s.avgdl))
                       ELSE 0 END), 6) AS score
            FROM persco p, stats s GROUP BY p.doc_id HAVING score > 0
            ORDER BY score DESC, p.doc_id LIMIT 10
        )
    """
    sql["q37_large_join"] = """
        SELECT o_orderpriority, count(*) AS n_lines,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """
    thresh = format(int(0.2 * 16**8), "08x")
    # strat branch mirrors pipelines/queries._STRAT_RATES via the engine's
    # threshold encoding format(int(rate * 16**8), "08x") — rates are
    # powers of two so the encoding is exact; 'zh' has no rate → excluded.
    strat_case = " ".join(
        f"WHEN lang = '{s}' THEN '{format(int(r * 16**8), '08x')}'"
        for s, r in [("en", 0.5), ("de", 0.25), ("es", 0.125), ("fr", 0.0625)]
    )
    # budget branch mirrors pipelines/queries._TOKEN_BUDGETS: per-lang
    # hash-ordered greedy prefix while the INCLUSIVE token cumsum stays
    # within budget (token_budget_sample's window-cumsum contract)
    from graphiti_hf_ray.pipelines.queries import _TOKEN_BUDGETS as _TB

    budget_case = " ".join(f"WHEN lang = '{s}' THEN {b}" for s, b in sorted(_TB.items()))
    # mix branch mirrors pipelines/queries._MIX_WEIGHTS via mixture_sample's
    # encoding: floor(w) full epochs per row, plus epoch floor(w) iff
    # md5('m:' || doc_id) clears the frac(w) threshold (same "08x" scheme;
    # fractions are powers of two so the encoding is exact)
    from graphiti_hf_ray.pipelines.queries import _MIX_WEIGHTS as _MW

    mix_floor_case = " ".join(
        f"WHEN lang = '{s}' THEN {int(w)}" for s, w in sorted(_MW.items())
    )
    mix_frac_case = " ".join(
        f"WHEN lang = '{s}' THEN '{format(int((w - int(w)) * 16**8), '08x')}'"
        for s, w in sorted(_MW.items())
    )
    mix_max_e = max(int(w) + (1 if w != int(w) else 0) for w in _MW.values())
    sql["q38_sample_synopsis"] = f"""
        SELECT 'sample' AS kind, CAST(doc_id AS VARCHAR) AS v FROM documents
        WHERE substr(md5('s:' || doc_id), 1, 8) < '{thresh}'
        UNION ALL
        SELECT 'kmv', h FROM (
            SELECT h FROM (SELECT DISTINCT md5('k:' || text) AS h FROM documents)
            ORDER BY h LIMIT 32
        )
        UNION ALL
        SELECT 'strat', CAST(doc_id AS VARCHAR) FROM documents
        WHERE substr(md5('s:' || doc_id), 1, 8) < CASE {strat_case} ELSE '00000000' END
        UNION ALL
        SELECT 'budget', CAST(doc_id AS VARCHAR) FROM (
            SELECT doc_id,
                   SUM(len(string_split(text, chr(32)))) OVER (
                       PARTITION BY lang
                       ORDER BY md5('s:' || doc_id), doc_id
                       ROWS UNBOUNDED PRECEDING) AS run,
                   CASE {budget_case} ELSE NULL END AS cap
            FROM documents
        ) WHERE run <= cap
        UNION ALL
        SELECT 'mix', CAST(doc_id AS VARCHAR) || ':' || CAST(r.range AS VARCHAR)
        FROM documents CROSS JOIN range(0, {mix_max_e}) r
        WHERE r.range < CASE {mix_floor_case} ELSE 0 END
           OR (r.range = CASE {mix_floor_case} ELSE 0 END
               AND substr(md5('m:' || doc_id), 1, 8) < CASE {mix_frac_case} ELSE '00000000' END)
    """
    # boilerplate removal: fragments (len >= 4) in >= 50% of docs removed;
    # threshold mirrors the engine's max(2, ceil(frac * n_docs))
    # the domain-cap probe mirrors queries._DOMAIN_CAP and the fixture's
    # host assignment (url_of: host = doc_id % 13); smallest doc_id wins
    from graphiti_hf_ray.pipelines.queries import _DOMAIN_CAP as _DCAP

    sql["q39_boilerplate_removal"] = f"""
        WITH d AS (SELECT doc_id, string_split(text, chr(32)) AS t FROM documents),
        tok AS (
            SELECT DISTINCT doc_id, w
            FROM (SELECT doc_id, unnest(t) AS w FROM d) u WHERE length(w) >= 4
        ),
        freq AS (
            SELECT w FROM tok GROUP BY w
            HAVING count(*) >= greatest(2, CAST(ceil(0.5 * (SELECT count(*) FROM documents)) AS BIGINT))
        ),
        bad AS (SELECT coalesce(list(w), []) AS b FROM freq)
        SELECT doc_id,
               CAST(len(t) - len(kept) AS BIGINT) AS n_dropped_lines,
               md5(coalesce(array_to_string(kept, chr(32)), '')) AS fingerprint,
               CAST(row_number() OVER (PARTITION BY doc_id % 13 ORDER BY doc_id)
                    <= {_DCAP} AS BIGINT) AS kept_after_domain_cap
        FROM (
            SELECT doc_id, t,
                   list_filter(t, x -> NOT (length(x) >= 4 AND list_contains(b, x))) AS kept
            FROM d CROSS JOIN bad
        )
    """
    # q41: weighted label propagation, unrolled synchronous rounds. The
    # engine iterates to the fixpoint; the fixture converges well inside
    # _LP_ROUNDS rounds and extra rounds are no-ops at the fixpoint, so the
    # unrolled SQL is exact.
    _LP_ROUNDS = 8
    lp_rounds = []
    for i in range(_LP_ROUNDS):
        # MATERIALIZED is load-bearing: each round references the previous
        # label CTE twice; inlining would re-expand the whole upstream
        # pipeline 2^rounds times.
        lp_rounds.append(f"""
            c{i} AS MATERIALIZED (
                SELECT r.group_id, e.dst AS node, r.label AS cl, sum(e.w) AS cnt
                FROM adj e JOIN l{i} r ON r.group_id = e.group_id AND r.node = e.src
                GROUP BY 1, 2, 3
            ),
            t{i} AS MATERIALIZED (
                SELECT *, row_number() OVER (PARTITION BY group_id, node
                                             ORDER BY cnt DESC, cl DESC) AS rn
                FROM c{i}
            ),
            l{i + 1} AS MATERIALIZED (
                SELECT l.group_id, l.node,
                       CASE WHEN t.cnt > 1 THEN t.cl
                            ELSE greatest(coalesce(t.cl, -1), l.label) END AS label
                FROM l{i} l LEFT JOIN t{i} t
                  ON t.group_id = l.group_id AND t.node = l.node AND t.rn = 1
            )""")
    sql["q41_kg_communities_lp"] = f"""
        WITH {cte},
        merged AS (
            SELECT group_id, subj_uuid, pred, obj_uuid FROM gold_canon GROUP BY 1, 2, 3, 4
        ),
        pairw AS MATERIALIZED (
            SELECT group_id, least(subj_uuid, obj_uuid) AS a,
                   greatest(subj_uuid, obj_uuid) AS b, count(*) AS w
            FROM merged WHERE subj_uuid != obj_uuid GROUP BY 1, 2, 3
        ),
        adj AS MATERIALIZED (
            SELECT group_id, a AS src, b AS dst, w FROM pairw
            UNION ALL SELECT group_id, b, a, w FROM pairw
        ),
        nodes AS (
            SELECT DISTINCT group_id, u AS node FROM (
                SELECT group_id, subj_uuid AS u FROM merged
                UNION ALL SELECT group_id, obj_uuid FROM merged
            )
        ),
        l0 AS MATERIALIZED (
            SELECT group_id, node,
                   row_number() OVER (PARTITION BY group_id ORDER BY node) - 1 AS label
            FROM nodes
        ),
        {",".join(lp_rounds)},
        final AS (SELECT group_id, node, label FROM l{_LP_ROUNDS}),
        comm AS (SELECT group_id, label, min(node) AS root FROM final GROUP BY 1, 2)
        SELECT f.group_id, md5('lpc:' || f.group_id || ':' || c.root) AS community_uuid,
               f.node AS member_uuid
        FROM final f JOIN comm c ON c.group_id = f.group_id AND c.label = f.label
    """

    sql["q42_conflict_resolution"] = """
        WITH iv AS (
            SELECT user_id, event_type, event_id,
                   epoch_us(ts) AS start_us,
                   epoch_us(ts) + (CAST(floor(value) AS BIGINT) + 1) * 60000000 AS end_us
            FROM events
        ),
        marked AS (
            SELECT *, CASE WHEN start_us >= coalesce(max(end_us) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY start_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                   THEN 1 ELSE 0 END AS nc
            FROM iv
        ),
        clustered AS (
            SELECT *, sum(nc) OVER (PARTITION BY user_id, event_type
                                    ORDER BY start_us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS cluster
            FROM marked
        ),
        sized AS (
            SELECT *, count(*) OVER (PARTITION BY user_id, event_type, cluster) AS n_cluster,
                   row_number() OVER (PARTITION BY user_id, event_type, cluster
                                      ORDER BY start_us, event_id) AS pos
            FROM clustered
        )
        SELECT event_id, CAST(n_cluster AS BIGINT) AS n_cluster,
               CASE WHEN n_cluster > 1 AND pos < n_cluster THEN 'invalidated'
                    ELSE 'kept' END AS status
        FROM sized
    """

    sql["q45_range_join"] = """
        WITH sign AS (
            SELECT user_id, event_id AS signup_id, ts AS s_ts,
                   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e_ts
            FROM events WHERE event_type = 'signup'
        )
        SELECT e.event_id, s.signup_id
        FROM events e LEFT JOIN sign s
          ON s.user_id = e.user_id AND s.s_ts <= e.ts
         AND (s.e_ts IS NULL OR e.ts < s.e_ts)
    """

    # q50: fixed-point integer PageRank, 10 unrolled rounds (MATERIALIZED —
    # see the q41 note on exponential CTE inlining)
    _PR_ITERS = 10
    pr_rounds = []
    for i in range(_PR_ITERS):
        pr_rounds.append(f"""
            c{i} AS MATERIALIZED (
                SELECT e.group_id, e.dst AS node,
                       CAST(sum((p.pr * 85) // (100 * e.outdeg)) AS BIGINT) AS inflow
                FROM adjo e JOIN p{i} p ON p.group_id = e.group_id AND p.node = e.src
                GROUP BY 1, 2
            ),
            p{i + 1} AS MATERIALIZED (
                SELECT nb.group_id, nb.node, nb.base + coalesce(c.inflow, 0) AS pr
                FROM nb LEFT JOIN c{i} c
                  ON c.group_id = nb.group_id AND c.node = nb.node
            )""")
    sql["q50_pagerank"] = f"""
        WITH {cte},
        merged AS (
            SELECT group_id, subj_uuid, pred, obj_uuid FROM gold_canon GROUP BY 1, 2, 3, 4
        ),
        adj AS MATERIALIZED (SELECT DISTINCT group_id, subj_uuid AS src, obj_uuid AS dst FROM merged),
        outd AS MATERIALIZED (SELECT group_id, src, count(*) AS outdeg FROM adj GROUP BY 1, 2),
        allnodes AS (
            SELECT DISTINCT group_id, u AS node FROM (
                SELECT group_id, src AS u FROM adj UNION ALL SELECT group_id, dst FROM adj
            )
        ),
        nb AS MATERIALIZED (
            SELECT group_id, node,
                   (1000000000000 * 15) // (100 * count(*) OVER (PARTITION BY group_id)) AS base,
                   1000000000000 // count(*) OVER (PARTITION BY group_id) AS init
            FROM allnodes
        ),
        adjo AS MATERIALIZED (
            SELECT a.group_id, a.src, a.dst, o.outdeg
            FROM adj a JOIN outd o ON o.group_id = a.group_id AND o.src = a.src
        ),
        p0 AS MATERIALIZED (SELECT group_id, node, init AS pr FROM nb),
        {",".join(pr_rounds)}
        SELECT group_id, node, CAST(pr AS BIGINT) AS pr FROM p{_PR_ITERS}
    """

    # q51 oracle is GENERATED from the engine's rule table
    # (stages/attributes.NODE_ATTR_RULES / EDGE_ATTR_RULES) — adding a rule
    # there extends both sides in lockstep.
    from graphiti_hf_ray.stages.attributes import EDGE_ATTR_RULES as _EAR, NODE_ATTR_RULES as _NAR

    _node_sels = []
    for _r in _NAR:
        _key, _val = ("subj_uuid", "obj_c") if _r.keyed_on == "source" else ("obj_uuid", "subj_c")
        _node_sels.append(
            f"""
        SELECT DISTINCT 'node' AS kind, group_id, {_key} AS uuid,
               '{{"{_r.attr}": "' || first_value(val) OVER (
                   PARTITION BY group_id, {_key} ORDER BY valid_at DESC, val
               ) || '"}}' AS attributes
        FROM (
            -- hydration runs over MERGED edges, whose valid_at is
            -- min-over-occurrences; 'latest' = argmax of those
            -- fact-became-true times across distinct counterparts
            SELECT group_id, {_key}, {_val} AS val, min(valid_at) AS valid_at
            FROM gold_canon WHERE pred = '{_r.pred}' GROUP BY 1, 2, 3
        ) m_{_r.attr}"""
        )
    _edge_sels = []
    for _pred, (_attr, _fmt) in _EAR.items():
        if _attr == "year":  # JSON int value
            _vexpr = f"CAST(strftime(valid_at, '{_fmt}') AS BIGINT)"
        else:  # JSON string value, double-quoted
            _dq = '\'"\''
            _vexpr = f"{_dq} || strftime(valid_at, '{_fmt}') || {_dq}"
        _edge_sels.append(
            f"""
        SELECT 'edge', group_id,
               md5('rel:' || group_id || ':' || subj_uuid || ':' || pred || ':' || obj_uuid || ':' || epoch_us),
               '{{"{_attr}": ' || {_vexpr} || '}}'
        FROM merged WHERE pred = '{_pred}'"""
        )
    sql["q51_typed_attributes"] = f"""
        WITH {cte},
        merged AS (
            SELECT group_id, subj_uuid, pred, obj_uuid,
                   min(valid_at) AS valid_at, min(epoch_us) AS epoch_us
            FROM gold_canon GROUP BY 1, 2, 3, 4
        )
        {" UNION ALL ".join(_node_sels + _edge_sels)}
    """

    sql["q52_weighted_neardup"] = """
        WITH toks AS (
            SELECT doc_id, list_distinct(string_split(text, chr(32))) AS t FROM documents
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM toks a JOIN toks b ON a.doc_id < b.doc_id
        JOIN embeddings ea ON ea.vec_id = a.doc_id
        JOIN embeddings eb ON eb.vec_id = b.doc_id
        WHERE 0.6 * (CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
                     / len(list_distinct(a.t || b.t)))
            + 0.4 * list_cosine_similarity(ea.embedding, eb.embedding) >= 0.6
    """

    # q48's fused probes mirror pipelines/queries._CHUNK_MAX/_CHUNK_OVERLAP/
    # _PAR_TOKENS literally: 32-token chunks with 8 overlap (stride 24), and
    # disjoint 10-token paragraphs for the global cross-doc paragraph dedup
    # (row_number over (paragraph) ordered by (doc_id, par_idx) = the
    # engine's first-occurrence-wins rule). Fixture text is single-space
    # separated with no edge whitespace, so split-on-' ' == Python .split()
    # (validated: zero rows differ from the \s+ split at every sf).
    sql["q48_bpe_token_count"] = r"""
        WITH toks AS (
          SELECT doc_id,
                 len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_bpe_tokens,
                 regexp_split_to_array(text, ' ') AS a,
                 len(regexp_split_to_array(text, ' ')) AS n
          FROM documents
        ),
        chunks AS (
          SELECT doc_id,
                 unnest(generate_series(0, CASE WHEN n <= 32 THEN 0
                     ELSE CAST(ceil((n - 32) / 24.0) AS BIGINT) END)) AS chunk_idx,
                 a, n
          FROM toks WHERE n > 0
        ),
        cagg AS (
          SELECT doc_id, count(*) AS n_chunks,
                 md5(string_agg(array_to_string(a[chunk_idx*24+1 : least(chunk_idx*24+32, n)], ' '),
                                chr(31) ORDER BY chunk_idx)) AS chunks_md5
          FROM chunks GROUP BY doc_id
        ),
        pars AS (
          SELECT doc_id,
                 unnest(generate_series(0, CASE WHEN n <= 10 THEN 0
                     ELSE CAST(ceil((n - 10) / 10.0) AS BIGINT) END)) AS par_idx,
                 a, n
          FROM toks WHERE n > 0
        ),
        ranked AS (
          SELECT doc_id, par_idx,
                 array_to_string(a[par_idx*10+1 : least(par_idx*10+10, n)], ' ') AS p,
                 row_number() OVER (
                   PARTITION BY array_to_string(a[par_idx*10+1 : least(par_idx*10+10, n)], ' ')
                   ORDER BY doc_id, par_idx) AS rn
          FROM pars
        ),
        pdd AS (
          SELECT doc_id,
                 count(*) FILTER (rn > 1) AS n_dropped_paragraphs,
                 md5(coalesce(string_agg(p, chr(10) ORDER BY par_idx) FILTER (rn = 1), '')) AS pardedup_md5
          FROM ranked GROUP BY doc_id
        ),
        -- span-dedup probe (dedup_spans_global, K=5): every 5-token window
        -- keeps only its globally first (doc, pos); tokens covered by any
        -- losing window are spliced out. Untouched docs hash the ORIGINAL
        -- text (byte-identity contract).
        w AS (
          SELECT doc_id, unnest(list_transform(range(1, n - 5 + 2),
                 i -> struct_pack(pos := i - 1,
                                  g := array_to_string(a[i : i + 4], ' ')))) AS s
          FROM toks WHERE n >= 5
        ),
        wf AS (
          SELECT doc_id, s.pos AS pos,
                 row_number() OVER (PARTITION BY s.g ORDER BY doc_id, s.pos) AS rn,
                 count(*) OVER (PARTITION BY s.g) AS c
          FROM w
        ),
        cov AS (
          SELECT DISTINCT doc_id, unnest(range(pos, pos + 5)) AS tp
          FROM wf WHERE c > 1 AND rn > 1
        ),
        covl AS (SELECT doc_id, list(tp) AS cl FROM cov GROUP BY doc_id),
        sdd AS (
          SELECT t.doc_id,
                 CASE WHEN covl.cl IS NULL THEN md5(d.text)
                      -- array_to_string of an empty list is NULL in DuckDB;
                      -- a fully-removed doc must hash the empty string
                      ELSE md5(coalesce(array_to_string(list_transform(
                               list_filter(range(1, n + 1), j -> NOT list_contains(covl.cl, j - 1)),
                               j -> a[j]), ' '), ''))
                 END AS spandedup_md5,
                 COALESCE(len(covl.cl), 0) AS n_removed_tokens
          FROM toks t JOIN documents d USING (doc_id)
          LEFT JOIN covl ON covl.doc_id = t.doc_id
        )
        SELECT t.doc_id, t.n_bpe_tokens, cagg.n_chunks, cagg.chunks_md5,
               pdd.n_dropped_paragraphs, pdd.pardedup_md5,
               sdd.n_removed_tokens, sdd.spandedup_md5
        FROM toks t JOIN cagg USING (doc_id) JOIN pdd USING (doc_id)
             JOIN sdd ON sdd.doc_id = t.doc_id
    """

    sql["q47_knn_multi"] = " UNION ALL ".join(
        f"""(
            SELECT {qi} AS query_idx, vec_id FROM embeddings
            ORDER BY list_cosine_similarity(embedding,
                     (SELECT embedding FROM embeddings WHERE vec_id = {qi})) DESC, vec_id
            LIMIT 10
        )"""
        for qi in range(3)
    )

    # q46: winnowing fingerprints — gram hash = first 8 hex chars of
    # md5(gram) as int, windows of 5 gram hashes, min per window, distinct
    hex_to_int = " + ".join(
        f"(strpos('0123456789abcdef', substr(hh, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    sql["q46_winnow_fingerprints"] = f"""
        WITH toks AS (SELECT doc_id, string_split(text, chr(32)) AS t FROM documents),
        pos AS (
            SELECT doc_id, t, unnest(list_transform(range(1, len(t) - 2), i -> i)) AS i
            FROM toks WHERE len(t) >= 4
        ),
        grams AS (
            SELECT doc_id, i,
                   md5(t[i] || chr(32) || t[i+1] || chr(32) || t[i+2] || chr(32) || t[i+3]) AS hh
            FROM pos
            UNION ALL
            SELECT doc_id, 1 AS i, md5(text) AS hh
            FROM documents WHERE len(string_split(text, chr(32))) < 4
        ),
        hashes AS (SELECT doc_id, i, CAST({hex_to_int} AS BIGINT) AS h FROM grams),
        ng AS (SELECT doc_id, count(*) AS n FROM hashes GROUP BY 1),
        wpos AS (
            SELECT doc_id, unnest(list_transform(range(1, greatest(n - 3, 2)), x -> x)) AS j
            FROM ng
        ),
        wins AS (
            SELECT w.doc_id, w.j, min(g.h) AS fp
            FROM wpos w JOIN hashes g
              ON g.doc_id = w.doc_id AND g.i BETWEEN w.j AND w.j + 4
            GROUP BY 1, 2
        )
        SELECT DISTINCT doc_id, fp FROM wins
    """

    sql["q44_rolling_window"] = """
        WITH daily AS (
            SELECT event_type, epoch_us(ts) // 1000000 // 86400 AS bucket,
                   count(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, bucket,
               CAST(sum(n) OVER (PARTITION BY event_type ORDER BY bucket
                                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n_window
        FROM daily
    """

    # q43: as-of join — clicks sort before other events at equal ts (the
    # engine's allow_equal=True side ordering), ties among clicks break to
    # the larger event_id (the engine's tiebreak column)
    sql["q43_asof_join"] = """
        WITH ordered AS (
            SELECT user_id, event_id, ts, event_type,
                   row_number() OVER (PARTITION BY user_id
                       ORDER BY ts, CASE WHEN event_type = 'click' THEN 0 ELSE 1 END,
                                event_id) AS rn
            FROM events
        )
        SELECT event_id,
               last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY rn
                         ROWS UNBOUNDED PRECEDING) AS prev_click_id
        FROM ordered
    """

    sql["q40_episodes_by_mention"] = f"""
        WITH {cte},
        seed AS (
            SELECT min(md5('ent:' || group_id || ':' || label || ':' || canon_name)) AS s
            FROM canon WHERE group_id = 'g0'
        )
        SELECT DISTINCT episode_uuid FROM (
            SELECT episode_uuid, subj_uuid AS entity_uuid FROM gold_canon
            UNION ALL
            SELECT episode_uuid, obj_uuid FROM gold_canon
        ), seed WHERE entity_uuid = seed.s
    """
    return sql
