"""r12 operator batch: unit tests with hand-computed expectations plus
full oracle-parity drives of the staged r13 faces (staging_r13.py) —
the same harness comparison the registry faces get, run BEFORE these
faces are ever registered (the r10 lesson: driver verification is the
only unfakeable signal, so staged faces pre-clear the identical bar).
Library hand examples for logrank_cells / mantel_haenszel_cells live in
tests/test_r11_ops.py (the operators shipped in r11; the faces are
r12's)."""

from __future__ import annotations

import pytest

from npm_mirror_spark.staging_r13 import STAGED_ORACLES, STAGED_QUERIES
from tests.oracle_harness import compare, duckdb_con


# ------------------------------------------------------- oracle parity


@pytest.mark.parametrize("name", sorted(STAGED_QUERIES))
def test_staged_face_matches_oracle(spark, sf_dir, name):
    """Every staged r13 face must clear the registry-identical harness
    bar (rows + schema + canonical values vs DuckDB) BEFORE it is ever
    registered."""
    con = duckdb_con(sf_dir)
    df = STAGED_QUERIES[name](spark, sf_dir)
    problems = compare(df, con, STAGED_ORACLES[name])
    assert not problems, f"{name}: {problems}"


def test_staged_faces_have_oracles_and_rows(spark, sf_dir):
    assert set(STAGED_QUERIES) == set(STAGED_ORACLES)
    for name, q in STAGED_QUERIES.items():
        assert q(spark, sf_dir).count() > 0, f"{name} returned no rows"


def test_staged_faces_disjoint_from_registry():
    """The register-into-window-only rule: staged faces stay OUT of the
    registry until the r13 rotation lifts them."""
    from npm_mirror_spark.queries import QUERIES

    assert not set(STAGED_QUERIES) & set(QUERIES)
