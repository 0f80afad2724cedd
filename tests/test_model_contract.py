"""Real-model injectability contract (VERDICT ST1/ST2/ST7 follow-up).

The engine's model slots are callable CLASSES run as map_batches actor
pools: expensive state loads once in ``__init__`` (per actor), work happens
in ``__call__`` (per Arrow batch). These tests push fake "heavy" clients —
classes that record when their expensive constructor runs — through the
exact actor-pool seams the pipeline uses, proving a real NER / embedding /
cross-encoder client drops in without touching engine code:

- constructor runs once per ACTOR, not per batch;
- the batch contract (Arrow in → Arrow out, pipeline schemas) holds;
- ``CrossEncoderScore(model_loader=...)`` accepts a zero-arg loader
  returning any object with ``.rank(query, [(id, passage)])``.

The fake classes are defined INSIDE the test functions on purpose:
module-level classes in a test file pickle by reference and Ray workers
cannot import the tests package (an actor whose class fails to import
restart-loops forever); local classes pickle by value — which is also how
a user would ship a custom client class from a notebook.
"""

from __future__ import annotations

import uuid as _uuid

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from graphiti_hf_ray.extract.triples import TRIPLES_SCHEMA
from graphiti_hf_ray.schemas import EMBED_DIM


def _episodes_ds(n=512):
    return rd.from_arrow(
        pa.table(
            {
                "uuid": pa.array([f"ep{i:05d}" for i in range(n)], pa.string()),
                "group_id": pa.array(["g0"] * n, pa.string()),
                "content": pa.array(["Ada works at Acme."] * n, pa.string()),
                "valid_at": pa.array([1704067200_000_000] * n, pa.timestamp("us")),
            }
        )
    )


def test_heavy_extractor_actor_pool_contract(ray_session):
    schema = TRIPLES_SCHEMA

    class FakeHeavyNER:
        """Stands in for a GPU NER/OpenIE client: slow-to-construct state,
        then per-batch inference; emits its per-actor init token into every
        row so distinct initializations can be counted."""

        def __init__(self):
            self.init_token = _uuid.uuid4().hex  # "model load" happens here

        def __call__(self, batch: pa.Table) -> pa.Table:
            uuids = batch.column("uuid").to_pylist()
            n = len(uuids)
            return pa.table(
                {
                    "episode_uuid": pa.array(uuids, pa.string()),
                    "group_id": batch.column("group_id"),
                    "valid_at": batch.column("valid_at"),
                    "subj_surface": pa.array(["S"] * n, pa.string()),
                    "subj_label": pa.array(["Person"] * n, pa.string()),
                    "pred": pa.array(["WORKS_AT"] * n, pa.string()),
                    "obj_surface": pa.array(["Acme"] * n, pa.string()),
                    "obj_label": pa.array(["Organization"] * n, pa.string()),
                    "fact": pa.array([self.init_token] * n, pa.string()),
                    "sent_idx": pa.array([0] * n, pa.int32()),
                },
                schema=schema,
            )

    out = (
        _episodes_ds()
        .map_batches(FakeHeavyNER, batch_format="pyarrow", batch_size=64, concurrency=2)
        .to_pandas()
    )
    assert len(out) == 512
    # schema contract: exactly the pipeline's triples schema
    assert list(out.columns) == list(TRIPLES_SCHEMA.names)
    # 8 batches, but at most 2 actor inits (and at least 1)
    inits = out["fact"].nunique()
    assert 1 <= inits <= 2, f"expected <=2 actor inits, saw {inits}"


def test_heavy_embedder_actor_pool_contract(ray_session):
    from graphiti_hf_ray.stages.embed import Embedder

    dim = EMBED_DIM

    class FakeHeavyEmbedder:
        """Signature-compatible with stages.embed.Embedder: same
        constructor shape (text_col, out_col, dim) and batch contract."""

        def __init__(self, text_col: str, out_col: str, d: int = dim):
            self.text_col, self.out_col, self.dim = text_col, out_col, d
            self.init_token = _uuid.uuid4().hex

        def __call__(self, batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            mat = np.full((n, self.dim), 0.5, np.float32)
            arr = pa.FixedSizeListArray.from_arrays(pa.array(mat.ravel(), pa.float32()), self.dim)
            return batch.append_column(self.out_col, arr).append_column(
                "_init", pa.array([self.init_token] * n, pa.string())
            )

    ds = rd.from_arrow(
        pa.table({"fact": pa.array([f"fact {i}" for i in range(256)], pa.string())})
    )
    fake = ds.map_batches(
        FakeHeavyEmbedder("fact", "fact_embedding"),
        batch_format="pyarrow", batch_size=32, concurrency=2,
    ).to_pandas()
    assert fake["_init"].nunique() <= 2  # once per actor across 8 batches
    # output embedding width matches the real Embedder's (drop-in parity)
    real = ds.map_batches(Embedder("fact", "fact_embedding"), batch_format="pyarrow").to_pandas()
    assert len(fake["fact_embedding"].iloc[0]) == len(real["fact_embedding"].iloc[0]) == EMBED_DIM


def test_cross_encoder_model_loader_injection(ray_session):
    from graphiti_hf_ray.search.rerank import CrossEncoderScore, cross_encoder_rerank_distributed

    class FakeHeavyCE:
        loads = 0

        def __init__(self):
            type(self).loads += 1

        def rank(self, query, passages):
            return sorted(
                ((uid, float(len(p))) for uid, p in passages), key=lambda kv: (-kv[1], kv[0])
            )

    ds = rd.from_arrow(
        pa.table(
            {
                "uuid": pa.array([f"u{i}" for i in range(40)], pa.string()),
                "fact": pa.array(["word " * (i % 7 + 1) for i in range(40)], pa.string()),
            }
        )
    )
    out = cross_encoder_rerank_distributed(ds, "some query", "fact", model_loader=FakeHeavyCE, k=5)
    assert len(out) == 5 and list(out.columns) == ["uuid", "ce_score"]
    # driver-side class counter is NOT shared with actor processes — verify
    # the loader seam locally instead: one construction, many batches
    stage = CrossEncoderScore("q", model_loader=FakeHeavyCE)
    before = FakeHeavyCE.loads
    stage(pa.table({"uuid": pa.array(["a"]), "passage": pa.array(["text"])}))
    stage(pa.table({"uuid": pa.array(["b"]), "passage": pa.array(["text two"])}))
    assert FakeHeavyCE.loads == before  # no per-batch reloads


def test_unavailable_backend_raises():
    from graphiti_hf_ray.search.rerank import CrossEncoderScore

    with pytest.raises(NotImplementedError):
        CrossEncoderScore("q", model_loader="bge")


def test_sentence_transformer_adapter_seam(ray_session):
    """r3 VERDICT #5: the REAL adapter class (models.SentenceTransformerEmbedder)
    runs through the actor-pool seam with an injected model object — the
    exact way a user drops in a loaded/quantized sentence-transformers
    model — producing the Embedder-compatible fixed-size-list column."""
    from graphiti_hf_ray.models import SentenceTransformerEmbedder

    class FakeSTModel:
        """sentence-transformers .encode surface; unnormalized output so
        the adapter's normalize path is exercised."""

        def encode(self, texts):
            return np.stack([np.full(8, 1.0 + len(t), np.float32) for t in texts])

    ds = rd.from_arrow(
        pa.table({"fact": pa.array([f"fact {i}" for i in range(64)], pa.string())})
    )
    out = ds.map_batches(
        SentenceTransformerEmbedder("fact", "fact_embedding", model=FakeSTModel()),
        batch_format="pyarrow", batch_size=16, concurrency=2,
    ).to_pandas()
    assert len(out) == 64
    v = np.asarray(out["fact_embedding"].iloc[0])
    assert v.shape == (8,)
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5  # normalized
    # newline normalization (reference EmbedderClient behavior)
    t = SentenceTransformerEmbedder("fact", "e", model=FakeSTModel())(
        pa.table({"fact": pa.array(["a\nb"])})
    )
    assert len(t.column("e")) == 1


def test_bge_cross_encoder_adapter_seam(ray_session):
    """The real BGE adapter (.predict surface) flows through
    CrossEncoderScore via model_loader — both as an injected client and
    via the 'bge' name (which must raise clearly without the library)."""
    from graphiti_hf_ray.models import BGECrossEncoderClient
    from graphiti_hf_ray.search.rerank import CrossEncoderScore, cross_encoder_rerank_distributed

    class FakeBGEModel:
        def predict(self, pairs):
            # score = passage length → deterministic ordering
            return np.asarray([float(len(p)) for _, p in pairs])

    ds = rd.from_arrow(
        pa.table(
            {
                "uuid": pa.array([f"u{i}" for i in range(12)], pa.string()),
                "passage": pa.array(["x" * (i + 1) for i in range(12)], pa.string()),
            }
        )
    )
    top = cross_encoder_rerank_distributed(
        ds, "query", text_col="passage", id_col="uuid", k=3,
        model_loader=lambda: BGECrossEncoderClient(model=FakeBGEModel()),
    )
    assert list(top["uuid"]) == ["u11", "u10", "u9"]  # longest passages win
    # 'bge' name without the library installed → clear gated error
    with pytest.raises(NotImplementedError, match="sentence-transformers"):
        CrossEncoderScore("q", model_loader="bge")
    assert BGECrossEncoderClient(model=FakeBGEModel()).rank("q", []) == []


def test_openai_compat_embedder_real_http_transport(ray_session):
    """The OpenAI-compatible embedder's REAL urllib transport runs through
    the actor-pool seam against a local /v1/embeddings server serving the
    standard response shape — the full wire path minus the provider."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from graphiti_hf_ray.models import OpenAICompatEmbedder

    class FakeOpenAI(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            assert self.path == "/v1/embeddings"
            req = _json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            assert self.headers.get("Authorization") == "Bearer test-key"
            data = [
                # deterministic: embedding = [len(text), index] padded to 4
                {"index": i, "embedding": [float(len(t)), float(i), 0.0, 0.0]}
                for i, t in enumerate(req["input"])
            ]
            body = _json.dumps({"data": data, "model": req["model"]}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    server = ThreadingHTTPServer(("127.0.0.1", 8341), FakeOpenAI)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        ds = rd.from_arrow(
            pa.table({"fact": pa.array([f"t{'x' * i}" for i in range(32)], pa.string())})
        )
        out = ds.map_batches(
            OpenAICompatEmbedder(
                "fact", "emb",
                endpoint="http://127.0.0.1:8341/v1", api_key="test-key", dim=4,
            ),
            batch_format="pyarrow", batch_size=8, concurrency=2,
        ).to_pandas()
        assert len(out) == 32
        got = {int(v[0]) for v in out["emb"]}
        assert got == {len(f"t{'x' * i}") for i in range(32)}  # lengths round-tripped
    finally:
        server.shutdown()


def test_openai_compat_extractor_injected_transport(ray_session):
    """ST1's real-LLM adapter (models.OpenAICompatExtractor) through the
    actor-pool seam with a monkeypatched transport: TRIPLES_SCHEMA out,
    code fences stripped, illegal edge_type_map signatures dropped,
    malformed edges skipped, valid_at inherits the episode time when the
    model returns null."""
    import json as _json

    from graphiti_hf_ray.models import OpenAICompatExtractor

    def fake_llm(messages):
        assert messages[0]["role"] == "system"
        body = messages[1]["content"]
        edges = [
            {
                "subject": "Ada", "subject_label": "Person", "predicate": "WORKS_AT",
                "object": "Acme", "object_label": "Organization",
                "fact": body.splitlines()[-1], "valid_at": "2024-02-03T00:00:00Z",
            },
            # illegal per edge_type_map: MOVED_TO needs (Person, Place)
            {
                "subject": "Acme", "subject_label": "Organization", "predicate": "MOVED_TO",
                "object": "Oslo", "object_label": "Organization", "fact": "x", "valid_at": None,
            },
            # malformed: missing object
            {"subject": "Ada", "subject_label": "Person", "predicate": "FOUNDED"},
            # no valid_at → episode reference time; no fact → synthesized
            {
                "subject": "Grace", "subject_label": "Person", "predicate": "MOVED_TO",
                "object": "Oslo", "object_label": "Place", "valid_at": None,
            },
        ]
        return "```json\n" + _json.dumps({"edges": edges}) + "\n```"

    out = (
        _episodes_ds(64)
        .map_batches(
            OpenAICompatExtractor(transport=fake_llm),
            batch_format="pyarrow", batch_size=16, concurrency=2,
        )
        .to_pandas()
    )
    assert list(out.columns) == list(TRIPLES_SCHEMA.names)
    assert len(out) == 128  # 2 kept edges per episode
    one = out[out["episode_uuid"] == "ep00000"].sort_values("sent_idx")
    assert list(one["pred"]) == ["WORKS_AT", "MOVED_TO"]
    assert list(one["sent_idx"]) == [0, 1]
    assert str(one.iloc[0]["valid_at"]) == "2024-02-03 00:00:00"   # model date
    assert str(one.iloc[1]["valid_at"]) == "2024-01-01 00:00:00"   # episode time
    assert one.iloc[1]["fact"] == "Grace MOVED_TO Oslo"            # synthesized


def test_openai_compat_extractor_real_http_transport(ray_session):
    """Full wire path minus the provider: the adapter's urllib transport
    against a local /v1/chat/completions server returning the standard
    response shape, driven through the actor pool."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from graphiti_hf_ray.models import OpenAICompatExtractor

    class FakeChat(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            assert self.path == "/v1/chat/completions"
            req = _json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            assert req["response_format"] == {"type": "json_object"}
            assert self.headers.get("Authorization") == "Bearer test-key"
            content = _json.dumps(
                {
                    "edges": [
                        {
                            "subject": "Ada", "subject_label": "Person",
                            "predicate": "WORKS_AT", "object": "Acme",
                            "object_label": "Organization",
                            "fact": req["messages"][1]["content"][-18:], "valid_at": None,
                        }
                    ]
                }
            )
            body = _json.dumps(
                {"choices": [{"message": {"role": "assistant", "content": content}}]}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    server = ThreadingHTTPServer(("127.0.0.1", 8342), FakeChat)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        out = (
            _episodes_ds(16)
            .map_batches(
                OpenAICompatExtractor(endpoint="http://127.0.0.1:8342/v1", api_key="test-key"),
                batch_format="pyarrow", batch_size=8, concurrency=2,
            )
            .to_pandas()
        )
        assert len(out) == 16
        assert set(out["pred"]) == {"WORKS_AT"}
        assert list(out.columns) == list(TRIPLES_SCHEMA.names)
    finally:
        server.shutdown()
