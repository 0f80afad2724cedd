"""Shared CLI bootstrap for the scripts/ entry points — one place for the
ray.init policy so a new DataContext knob or address rule lands everywhere.
"""

from __future__ import annotations

import os
import sys


def init_ray(num_cpus: int | None = None) -> None:
    """Init Ray for a CLI entry point (no-op under ``ray job submit``,
    where the session already exists): local mode when ``--num-cpus`` is
    given, else RAY_ADDRESS / local auto. Silences Data progress bars and
    puts the repo root on sys.path so ``graphiti_hf_ray`` imports from a
    bare checkout."""
    import ray

    # repo root must be importable in the WORKERS too, so it goes on
    # PYTHONPATH before ray.init (sys.path mutations don't propagate);
    # without this the CLIs only work when launched from the repo root
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)
    if not ray.is_initialized():
        prev = os.environ.get("PYTHONPATH", "")
        os.environ["PYTHONPATH"] = repo_root + (os.pathsep + prev if prev else "")
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
        if num_cpus:
            ray.init(address="local", num_cpus=num_cpus, **kwargs)
        else:
            ray.init(address=os.environ.get("RAY_ADDRESS", "local"), **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
