"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_small() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def pages_parquet(tmp_path_factory, sf_small) -> str:
    """Materialize the deterministic pages fixture (with group_id) once."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from graphiti_hf_ray.fixtures import pages as P

    out = tmp_path_factory.mktemp("pages") / "pages.parquet"
    docs = pq.read_table(f"{sf_small}/documents.parquet", columns=["doc_id", "text", "lang"])
    pg = P.pages_batch(docs)
    pg = pg.append_column(
        "group_id", pa.array([P.group_of(int(d)) for d in docs.column("doc_id").to_pylist()])
    )
    pq.write_table(pg, str(out))
    return str(out)


@pytest.fixture(scope="session")
def duck(sf_small):
    """DuckDB connection with the documents view registered."""
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_small}/documents.parquet'")
    return con
