"""KG-construction job driver — the ``ray job submit`` entry point.

On a real cluster::

    ray job submit --working-dir /root/repo -- \
        python scripts/run_kg_job.py --pages s3://bucket/pages/*.parquet \
        --out s3://bucket/graph --shards 4096

In this sandbox (local mode)::

    python scripts/run_kg_job.py --pages /tmp/pages.parquet --out /tmp/graph

With a model-backed extractor (any OpenAI-compatible endpoint — vLLM,
Ollama, LM Studio, OpenAI; one chat request per episode inside the
shard tasks; reserve accelerators per task with --extractor-num-gpus)::

    OPENAI_API_KEY=... python scripts/run_kg_job.py ... \
        --extractor openai --llm-endpoint http://vllm:8000/v1 \
        --llm-model my-model --llm-api-key-env OPENAI_API_KEY \
        --extractor-num-gpus 1

The job is resumable: re-submitting after a failure skips extraction
shards whose lineage manifest matches, and the link phase re-derives the
global tables only when the shard set changed. Prints one JSON line of
job metrics (rows per table + per-phase timings).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser(description="Build a temporal knowledge graph from web pages")
    ap.add_argument("--pages", nargs="+", required=True, help="input pages parquet path(s), or JSONL with --from-jsonl")
    ap.add_argument("--out", required=True, help="output graph directory")
    ap.add_argument("--from-jsonl", action="store_true",
                    help="inputs are newline-delimited-JSON crawl records: normalize "
                         "them into <out>/_pages_jsonl first (io.pages_from_jsonl; "
                         "resumable — a same-input re-run skips the conversion)")
    ap.add_argument("--on-bad", choices=("error", "drop"), default="error",
                    help="with --from-jsonl/--from-warc: invalid records raise "
                         "(default) or drop")
    ap.add_argument("--from-warc", action="store_true",
                    help="inputs are WARC or WET files (plain or per-record gzip): "
                         "keep text/html response records (wire form decoded) and "
                         "text/plain conversion records, normalized into "
                         "<out>/_pages_warc first (io.pages_from_warc; resumable)")
    ap.add_argument("--source-fingerprint", default="",
                    help="with --from-jsonl/--from-warc: precomputed input "
                         "fingerprint (e.g. crawl-segment id or object-store "
                         "etags) — skips the default driver-side content digest "
                         "over every input file")
    ap.add_argument("--shards", type=int, default=None, help="extraction shard count")
    ap.add_argument("--run-ts-us", type=int, default=None, help="injected run timestamp (µs)")
    ap.add_argument("--num-cpus", type=int, default=None, help="local-mode CPU count (cluster mode: omit)")
    ap.add_argument("--extractor", choices=("deterministic", "openai"), default="deterministic",
                    help="triple extractor: the deterministic pattern engine (default) or "
                         "models.OpenAICompatExtractor against --llm-endpoint (one chat "
                         "request per episode, inside the shard tasks)")
    ap.add_argument("--llm-endpoint", default="http://127.0.0.1:8000/v1",
                    help="with --extractor openai: OpenAI-compatible base URL "
                         "(vLLM / Ollama / LM Studio / OpenAI)")
    ap.add_argument("--llm-model", default="gpt-4o-mini", help="with --extractor openai: model name")
    ap.add_argument("--llm-api-key-env", default="",
                    help="with --extractor openai: ENV VAR holding the API key "
                         "(read from the environment — a key on argv leaks via ps)")
    ap.add_argument("--extractor-num-gpus", type=float, default=None,
                    help="GPUs reserved per extraction shard task (model-backed extractors)")
    ap.add_argument("--extractor-num-cpus", type=float, default=None,
                    help="CPUs reserved per extraction shard task")
    args = ap.parse_args()

    import ray

    from _bootstrap import init_ray

    init_ray(args.num_cpus)
    from graphiti_hf_ray.pipelines.kg import DEFAULT_RUN_TS_US, build_graph

    t0 = time.time()
    pages = args.pages
    if args.from_jsonl and args.from_warc:
        ap.error("--from-jsonl and --from-warc are mutually exclusive")
    if args.from_jsonl:
        from graphiti_hf_ray.io import pages_from_jsonl

        pages = pages_from_jsonl(
            args.pages, os.path.join(args.out, "_pages_jsonl"),
            on_bad=args.on_bad, fingerprint=args.source_fingerprint,
        )
    elif args.from_warc:
        from graphiti_hf_ray.io import pages_from_warc

        pages = pages_from_warc(
            args.pages, os.path.join(args.out, "_pages_warc"),
            on_bad=args.on_bad, fingerprint=args.source_fingerprint,
        )
    extractor_factory = None
    if args.extractor == "openai":
        endpoint, model = args.llm_endpoint, args.llm_model
        api_key = os.environ.get(args.llm_api_key_env) if args.llm_api_key_env else None

        # defined in-function so cloudpickle ships it by value into the
        # shard tasks; the adapter itself (weights-free, stdlib HTTP)
        # builds once per worker via extract_phase's memo
        def extractor_factory():
            from graphiti_hf_ray.models import OpenAICompatExtractor

            return OpenAICompatExtractor(endpoint=endpoint, model=model, api_key=api_key)

    extractor_resources = {}
    if args.extractor_num_gpus is not None:
        extractor_resources["num_gpus"] = args.extractor_num_gpus
    if args.extractor_num_cpus is not None:
        extractor_resources["num_cpus"] = args.extractor_num_cpus
    metrics = build_graph(
        pages, args.out, run_ts_us=args.run_ts_us or DEFAULT_RUN_TS_US, num_shards=args.shards,
        extractor_factory=extractor_factory, extractor_resources=extractor_resources or None,
    )
    metrics["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(metrics))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
