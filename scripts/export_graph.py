"""Export a graph built by this engine back to the reference HF-datasets
layout (single-file nodes/edges/episodes[/communities] parquet splits) —
the inverse of the migration reader, so a graph built here can be handed
back to the reference stack.

    python scripts/export_graph.py --graph /path/to/graph --out /path/to/export
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser(description="Export a graph to the reference HF-datasets layout")
    ap.add_argument("--graph", required=True, help="graph directory (this engine's layout)")
    ap.add_argument("--out", required=True, help="output directory for the single-file splits")
    ap.add_argument("--num-cpus", type=int, default=None, help="local-mode CPU count")
    args = ap.parse_args()

    import ray

    from _bootstrap import init_ray

    init_ray(args.num_cpus)
    from graphiti_hf_ray.migration import export_reference_layout

    stats = export_reference_layout(args.graph, args.out)
    print(json.dumps(stats))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
