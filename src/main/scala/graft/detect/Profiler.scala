package graft.detect

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, NumericType, StringType}

import graft.model.ColumnProfile

/** Per-column profiling (the reference's aggregation workhorse — csv-detective
  * output_profile=True, invoked at analysis/csv.py:152-154; keys asserted in
  * tests/test_analysis/test_analysis_csv.py:84-86).
  *
  * Two distributed passes, independent of column count:
  *   1. one wide agg computing min/max/mean/std/missing/distinct for every
  *      column at once (partial+final hash agg, no row shuffle);
  *   2. one melt → groupBy(column, value) → windowed top-k for the top
  *      values of ALL columns in a single shuffle (instead of one
  *      groupBy-per-column, which would be #cols shuffles).
  *
  * At 100 TB set approxDistinct=true: exact count_distinct per column forces
  * an expensive expand; HLL (approx_count_distinct) keeps the pass cheap with
  * ~2% error, which is what a profile needs.
  */
object Profiler {

  def profile(df: DataFrame, topK: Int = 10, approxDistinct: Boolean = false): Map[String, ColumnProfile] = {
    val cols = df.schema.fields.toSeq
    if (cols.isEmpty || df.isEmpty) return Map.empty

    val aggs: Seq[Column] = cols.flatMap { f =>
      val c = col(f.name)
      val numeric = f.dataType match {
        case _: NumericType => c.cast("double")
        case BooleanType => c.cast("int").cast("double")
        case _ => lit(null).cast("double")
      }
      val distinct =
        if (approxDistinct) approx_count_distinct(c).as(s"${f.name}__distinct")
        else count_distinct(c).as(s"${f.name}__distinct")
      Seq(
        min(numeric).as(s"${f.name}__min"),
        max(numeric).as(s"${f.name}__max"),
        avg(numeric).as(s"${f.name}__mean"),
        stddev_samp(numeric).as(s"${f.name}__std"),
        count(when(c.isNull, lit(1))).as(s"${f.name}__missing"),
        distinct)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()

    val tops = topValues(df, cols.map(_.name), topK)

    cols.map { f =>
      val g = (suffix: String) => Option(row.getAs[Any](s"${f.name}__$suffix"))
      f.name -> ColumnProfile(
        min = g("min").map(_.asInstanceOf[Double]),
        max = g("max").map(_.asInstanceOf[Double]),
        mean = g("mean").map(_.asInstanceOf[Double]),
        std = g("std").map(_.asInstanceOf[Double]),
        tops = tops.getOrElse(f.name, Seq.empty),
        nbDistinct = row.getAs[Long](s"${f.name}__distinct"),
        nbMissingValues = row.getAs[Long](s"${f.name}__missing"))
    }.toMap
  }

  /** Top-k most frequent values for every column in one shuffle: melt the
    * table into (column, value) pairs with stack, count, rank per column. */
  private def topValues(df: DataFrame, names: Seq[String], k: Int): Map[String, Seq[(String, Long)]] = {
    val n = names.length
    val stackArgs = names.flatMap(c => Seq(s"'${c.replace("'", "''")}'", s"CAST(`$c` AS STRING)")).mkString(", ")
    val melted = df.selectExpr(s"stack($n, $stackArgs) AS (col_name, value)")
      .where(col("value").isNotNull)
    val counted = melted.groupBy("col_name", "value").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("col_name").orderBy(desc("cnt"), asc("value"))
    counted
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .collect()
      .toSeq
      .groupBy(_.getAs[String]("col_name"))
      .map { case (name, rows) =>
        name -> rows.sortBy(_.getAs[Int]("rk"))
          .map(r => (r.getAs[String]("value"), r.getAs[Long]("cnt")))
      }
  }
}
