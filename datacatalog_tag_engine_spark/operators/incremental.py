"""Incremental refresh + schema drift — the operators that make
scheduled re-tagging (SURVEY.md T1) affordable at catalog scale.

The reference re-runs every config on schedule against every matched
asset. At a million assets most re-computation is wasted: the asset's
data hasn't changed since its tags were written. ``stale_assets``
prunes the refresh set to assets whose data changed after their last
tag update (or that have no tag yet) — an anti-join + inequality
filter, so the scheduled job's cost tracks CHANGE RATE, not catalog
size.

``schema_diff`` compares two asset-inventory snapshots and reports
added/removed/retyped columns per asset — the drift signal that
triggers re-profiling or alerting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stale_assets(assets: DataFrame, tags: DataFrame, template_id: str | None = None) -> DataFrame:
    """Assets needing a refresh: no tag rows at all, or data updated
    after the newest tag row (asset.updated_ts > max(tag.updated_ts)).
    """
    t = tags if template_id is None else tags.filter(F.col("template_id") == template_id)
    last_tagged = t.groupBy("asset_uri").agg(F.max("updated_ts").alias("_last_tag_ts"))
    joined = assets.join(F.broadcast(last_tagged), "asset_uri", "left")
    return joined.filter(
        F.col("_last_tag_ts").isNull() | (F.col("updated_ts") > F.col("_last_tag_ts"))
    ).drop("_last_tag_ts")


def schema_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Per-asset schema drift between two inventory snapshots:
    (asset_uri, column, change) with change in ADDED | REMOVED | RETYPED.
    Assets present in only one snapshot are reported as ASSET_ADDED /
    ASSET_REMOVED with a null column. One full-outer join on the
    exploded (asset, column) grain.
    """
    def cols(df, side):
        # plain explode, not explode_outer: an asset with a null/empty
        # schema contributes NO column-grain rows (asset presence is
        # tracked separately below) — explode_outer's column=NULL rows
        # can never match across the ["asset_uri","column"] join and
        # reported every schemaless asset as spurious ADDED+REMOVED
        return df.select(
            "asset_uri",
            F.explode("schema").alias("_c"),
        ).filter(F.col("_c.name").isNotNull()).select(
            "asset_uri",
            F.col("_c.name").alias("column"),
            F.col("_c.type").alias(f"{side}_type"),
            F.lit(True).alias(f"_in_{side}"),
        )

    o = cols(old, "old")
    n = cols(new, "new")
    j = o.join(n, ["asset_uri", "column"], "full_outer")

    old_assets = old.select("asset_uri").distinct().withColumn("_oa", F.lit(True))
    new_assets = new.select("asset_uri").distinct().withColumn("_na", F.lit(True))
    asset_level = (
        old_assets.join(new_assets, "asset_uri", "full_outer")
        .filter(F.col("_oa").isNull() | F.col("_na").isNull())
        .select(
            "asset_uri",
            F.lit(None).cast("string").alias("column"),
            F.when(F.col("_oa").isNull(), "ASSET_ADDED").otherwise("ASSET_REMOVED").alias("change"),
        )
    )

    both_assets = old_assets.join(new_assets, "asset_uri", "inner").select("asset_uri")
    column_level = (
        j.join(F.broadcast(both_assets), "asset_uri", "left_semi")
        .withColumn(
            "change",
            F.when(F.col("_in_old").isNull(), "ADDED")
            .when(F.col("_in_new").isNull(), "REMOVED")
            .when(~F.col("old_type").eqNullSafe(F.col("new_type")), "RETYPED"),
        )
        .filter(F.col("change").isNotNull())
        .select("asset_uri", "column", "change")
    )
    return column_level.unionByName(asset_level)
