from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


def nsafe_sorted(rows):
    """Sort row tuples that may carry NULLs: None sorts first within
    its column and is never compared against a value (the "" stand-in
    is only ever compared against other stand-ins). THE one null-safe
    row canonicalizer for every test module — three near-identical
    copies had grown by r13."""
    return sorted(
        rows,
        key=lambda t: tuple((v is not None, "" if v is None else v) for v in t),
    )


@pytest.fixture(scope="session")
def spark():
    from etl_staging_spark.session import get_spark

    s = get_spark("tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def duck(request):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()
