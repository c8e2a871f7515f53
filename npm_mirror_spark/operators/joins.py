"""Joins (SURVEY.md §2.5, J1-J3).

The reference has no relational joins; its join-shaped logic is the
file-existence dedup probe (mirror.ts:114-126) and the per-row HTTP
enrichment fetch (changes_consumer.py:160-169). Both become real joins here:

- anti_join: left-anti against an inventory table. At scale: if the
  inventory is small, broadcast it (no shuffle of the big side); otherwise
  a shuffled hash/sort-merge anti join — still one pass.
- enrich_join: equi-join against a dimension; ``broadcast()`` hint when the
  dimension is known small (dimension tables in a star schema almost always
  are), which removes the shuffle of the fact side entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def anti_join(
    df: DataFrame,
    inventory: DataFrame,
    on: list[str] | str,
    broadcast_inventory: bool = False,
) -> DataFrame:
    """J1/F10: keep rows whose key is NOT present in ``inventory`` — the
    'skip download if the file already exists' probe, done set-at-a-time
    instead of one access() call per row.
    """
    inv = F.broadcast(inventory) if broadcast_inventory else inventory
    return df.join(inv, on=on, how="left_anti")


def semi_join(df: DataFrame, other: DataFrame, on: list[str] | str) -> DataFrame:
    """The complement probe: keep rows whose key IS present."""
    return df.join(other, on=on, how="left_semi")


def enrich_join(
    facts: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """J2: enrichment lookup. The reference fetches per row over HTTP;
    batch-side we model it as an equi-join against the enrichment table.
    (The real lateral-HTTP path lives in streaming.enrichment as a
    mapInPandas seam with an injectable fetcher.)
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return facts.join(d, on=on, how=how)
