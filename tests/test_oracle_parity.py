"""Every declared query in the registry must match its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from pgcapture_spark.queries import REGISTRY
from tests.conftest import SF_SMALL
from tests.oracle import assert_parity


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_parity(spark, name):
    qd = REGISTRY[name]
    if qd.oracle is None:
        df = qd.fn(spark, SF_SMALL)
        assert df.count() >= 0  # rows-only check, mirrors driver's weaker gate
    else:
        assert_parity(spark, name, qd.fn, qd.oracle, SF_SMALL)
