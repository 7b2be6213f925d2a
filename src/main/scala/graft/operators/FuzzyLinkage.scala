package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood record linkage (Hernández & Stolfo 1995 — public):
  * instead of blocking on an equality key (whose hottest block degenerates
  * to n² pairs) or comparing all pairs, ORDER the union of both sides by
  * the match key and compare each row only to its `neighborhood` sorted
  * neighbors. Candidates are n·k, the sort is skew-proof, and exact
  * Levenshtein scores the survivors.
  *
  * Scale shape: Sharding.rankByColumns supplies the global 0-based sort
  * position via range partitioning + two-phase prefix sums (no
  * single-partition window anywhere); the candidate generation is an
  * explode to the k probe positions followed by ONE equi-join on the
  * position — a hash join moving n·k rows, never a cross product. The
  * per-dirty-row argmin is a window over candidate groups.
  *
  * A candidate pair farther than `neighborhood` positions apart in the
  * sort is NOT considered (the SNM trade-off); pick the sort key so edits
  * keep variants nearby, or union several passes with different keys. */
object FuzzyLinkage {

  /** For each `dirty` row, its best `clean` match: minimum Levenshtein
    * distance ≤ `maxDist` among the sorted neighborhood, ties to the
    * smallest clean id. Output: dirty_id, dirty_val, clean_id, clean_val,
    * dist — one row per dirty row that found a match. */
  def bestMatch(
      clean: DataFrame,
      dirty: DataFrame,
      cleanId: String,
      cleanCol: String,
      dirtyId: String,
      dirtyCol: String,
      neighborhood: Int = 8,
      maxDist: Int = 2): DataFrame = {
    require(neighborhood > 0, "neighborhood must be positive")
    require(maxDist >= 0, "maxDist must be non-negative")
    val u = clean
      .select(col(cleanId).cast("long").as("__id"), col(cleanCol).as("__val"),
        lit(0).as("__src"))
      .unionByName(dirty.select(col(dirtyId).cast("long").as("__id"),
        col(dirtyCol).as("__val"), lit(1).as("__src")))
    val ranked = Sharding.rankByColumns(u, Seq("__val", "__src", "__id"))

    val probes = ranked.where(col("__src") === 1)
      .select(col("__id").as("dirty_id"), col("__val").as("dirty_val"),
        explode(sequence(col("pos") - neighborhood, col("pos") + neighborhood))
          .as("pos"))
    val targets = ranked.where(col("__src") === 0)
      .select(col("__id").as("clean_id"), col("__val").as("clean_val"), col("pos"))
    val scored = probes.join(targets, Seq("pos"))
      .withColumn("dist", levenshtein(col("dirty_val"), col("clean_val")))
      .where(col("dist") <= maxDist)
    val w = Window.partitionBy("dirty_id").orderBy(col("dist"), col("clean_id"))
    scored
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select("dirty_id", "dirty_val", "clean_id", "clean_val", "dist")
  }
}
