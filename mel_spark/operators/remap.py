"""J1 — entity-id redirect remap as a broadcast left join.

The reference materializes the QID redirect map as a dense 3×10⁸ int array and
indexes into it (src/utils/qids_remap.py:28-55), decorating every loader
(src/utils/loaders.py:37-56). Under Spark this is a broadcast hash join +
coalesce — the dense-array trick (and its 1 GB RAM cost) disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def remap_ids(
    facts: DataFrame,
    redirects: DataFrame,
    id_col: str,
    old_col: str = "old_entity_id",
    new_col: str = "new_entity_id",
) -> DataFrame:
    """Replace ``id_col`` by its redirect target when one exists (identity
    otherwise). Redirects are assumed small → explicit broadcast."""
    r = F.broadcast(
        redirects.select(F.col(old_col).alias("_old"), F.col(new_col).alias("_new"))
    )
    out = facts.join(r, facts[id_col] == r["_old"], "left")
    return out.withColumn(id_col, F.coalesce("_new", id_col)).drop("_old", "_new")
