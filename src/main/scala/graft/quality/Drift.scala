package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crosswalk drift detection (reference operator J1,
  * check_crosswalk_drift.py:30-69): plants present in a raw fact table
  * with no row in `plant_crosswalk` for that source system.
  *
  * Plan shape: distinct on the fact side collapses to per-plant keys
  * (hash aggregate), then a LEFT ANTI join against the (tiny, filtered)
  * crosswalk — Catalyst broadcasts the crosswalk side, so the whole
  * check is one scan of the fact table regardless of its size.
  *
  * NULL semantics: the reference pre-filters `key IS NOT NULL` on both
  * sides (check_crosswalk_drift.py:58, :63); we must keep those filters
  * for identical results (SURVEY.md §4, join-reorder row).
  */
object Drift {

  /** Distinct fact-side keys with no crosswalk match. */
  def missingFromCrosswalk(
      raw: DataFrame,
      rawKey: Column,
      crosswalk: DataFrame,
      crosswalkKey: Column,
      crosswalkFilter: Column,
  ): DataFrame = {
    val factKeys = raw
      .select(rawKey.as("plant_key"))
      .filter(col("plant_key").isNotNull)
      .distinct()
    val cw = crosswalk
      .filter(crosswalkFilter && crosswalkKey.isNotNull)
      .select(crosswalkKey.as("plant_key"))
    factKeys
      .join(broadcast(cw), Seq("plant_key"), "left_anti")
      .orderBy("plant_key")
  }

  /** Quality-floor gate (reference monthly-extraction.yml:612-628:
    * abort crosswalk rebuild if NPP coal plants < 200). */
  def qualityFloor(df: DataFrame, cond: Column, floor: Long): Boolean =
    df.filter(cond).count() >= floor
}
