"""Z-order layout: row groups must be tight in BOTH clustered dimensions
(measured from real parquet statistics), and tight enough to beat the
natural (time-ordered) layout by a wide margin — that tightness is
exactly what parquet predicate pushdown prunes on."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from npm_mirror_spark.operators.layout import write_zordered
from npm_mirror_spark.tables import load_table


def _mean_area(paths: list[str], col_a: str, col_b: str, span_a: float, span_b: float) -> float:
    """Mean (normalized range_a x normalized range_b) over row groups —
    the fraction of the 2-D value space each row group covers."""
    areas = []
    for p in paths:
        md = pq.ParquetFile(p).metadata
        for rg in range(md.num_row_groups):
            cols = {
                md.row_group(rg).column(i).path_in_schema: md.row_group(rg).column(i)
                for i in range(md.row_group(rg).num_columns)
            }
            sa = cols[col_a].statistics
            sb = cols[col_b].statistics
            areas.append(
                ((sa.max - sa.min) / span_a) * ((sb.max - sb.min) / span_b)
            )
    return sum(areas) / len(areas)


def test_zorder_tightens_both_dimensions(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value").filter(
        "value IS NOT NULL"
    )
    lo_u, hi_u, lo_v, hi_v = ev.selectExpr(
        "min(user_id)", "max(user_id)", "min(value)", "max(value)"
    ).first()
    span_u, span_v = float(hi_u - lo_u), float(hi_v - lo_v)

    nat = str(tmp_path / "natural")
    ev.repartition(4).write.parquet(nat)  # arrival-ordered baseline
    zo = str(tmp_path / "zordered")
    write_zordered(ev, zo, ["user_id", "value"], bits=8, num_files=8)

    nat_area = _mean_area(glob.glob(nat + "/*.parquet"), "user_id", "value", span_u, span_v)
    zo_area = _mean_area(glob.glob(zo + "/*.parquet"), "user_id", "value", span_u, span_v)
    # natural layout row groups cover ~the whole 2-D space; z-order must
    # cut the covered fraction several-fold in the PRODUCT of dimensions
    assert zo_area < nat_area / 3, (zo_area, nat_area)

    # and the data survives the round trip
    assert spark.read.parquet(zo).count() == ev.count()
