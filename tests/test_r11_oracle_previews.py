"""r11 declaration preview: the r10 build-ahead operator's future
declared query, run against its EXACT intended DuckDB oracle SQL
through the same compare harness the driver uses — everything but the
registry entry (which must wait for the r11 window per the rotation
contract, enforced by tests/test_registry_rotation.py). When r11
declares q_group_sample, the query body and oracle string move
verbatim into a queries/ module (the tests/test_r10_oracle_previews.py
convention, which executed exactly this way for r10's three keys)."""

from __future__ import annotations

import pytest

from food_panda_etl_spark.tables import load_table
from tests.oracle_compare import compare

_SF01 = "/root/testdata/sf0.01"

_GS_K = 10


@pytest.fixture(params=["sf0.001", "sf0.01"])
def any_sf(request, sf_dir):
    return _SF01 if request.param == "sf0.01" else sf_dir


def test_group_sample_preview(spark, any_sf):
    """Per-language bottom-10 document sample: deterministic uniform
    per-group selection by the shared multiplicative id-hash, the
    row_number-over-(h, id) replay."""
    from food_panda_etl_spark.operators.sampling_group import (
        group_bottomk_sample,
    )

    d = load_table(spark, any_sf, "documents")
    got = group_bottomk_sample(d, ("lang",), _GS_K)
    oracle = f"""
    WITH h AS (SELECT lang, doc_id,
                      (doc_id * 1315423911) % 1000003 AS h
               FROM documents),
    r AS (SELECT lang, doc_id,
                 CAST(row_number() OVER (PARTITION BY lang
                                         ORDER BY h, doc_id) AS INT) AS rk
          FROM h)
    SELECT lang, doc_id, rk FROM r WHERE rk <= {_GS_K}
    """
    assert compare(got, oracle, any_sf) == []
