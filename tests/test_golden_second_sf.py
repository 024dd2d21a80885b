"""Second-SF golden regression (VERDICT r3 item 9): the 13 frozen-golden
queries are ALSO frozen at sf0.001 (tests/golden_sf0001/, written by
`FREEZE_SF_DIR=/root/testdata/sf0.001 FREEZE_GOLDEN_DIR=tests/golden_sf0001
python scripts/freeze_goldens.py` with the same cross-parallelism
determinism gate). A regression oracle pinned at a single SF can miss
scale-dependent drift (e.g. a window or threshold that only moves with
corpus size); matching at two SFs closes that gap.
"""

from __future__ import annotations

import json
import os

import pytest

from pke_spark import golden

GOLDEN2_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden_sf0001")
SF2_DIR = "/root/testdata/sf0.001"

NAMES = golden.golden_names(GOLDEN2_DIR)


@pytest.mark.skipif(not NAMES, reason="second-SF goldens not frozen yet")
@pytest.mark.parametrize("name", NAMES)
def test_second_sf_golden(spark, name):
    import __spark_entry__ as entry

    g = golden.load_golden(name, GOLDEN2_DIR)
    assert g["sf_dir"] == SF2_DIR
    pdf = entry.queries()[name](spark, SF2_DIR).toPandas()
    norm, _ = golden.normalize(pdf)
    assert list(norm.columns) == g["columns"], name
    got = json.loads(norm.to_json(orient="values"))
    assert got == g["rows"], f"{name}: {len(got)} vs {len(g['rows'])} rows"
