"""Catalog-WIDE plan invariants: the per-entry audits in test_plans.py
pin specific shapes; this sweep locks the global floor for every single
registry entry — no cartesian product and no row-at-a-time Python
anywhere in any of the ~120 physical plans. (1-row broadcast nested
loops — BM25/stats scalar frames — are a different, sanctioned node;
Arrow-batched mapInPandas shows as MapInPandas, not BatchEvalPython.)"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_no_row_python_anywhere(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    assert "BatchEvalPython" not in plan, name
