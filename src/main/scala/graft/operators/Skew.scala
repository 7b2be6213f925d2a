package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle-shape tools for the 100 TB posture (driver contract:
  * "repartition/bucketing for co-located joins, salting for skew").
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; explicit
  * salting still matters for (a) skewed AGGREGATIONS and (b) joins whose
  * skew AQE can't see (e.g. post-explode key storms). Bucketing removes the
  * shuffle from repeated equi-joins on a stable key entirely.
  */
object Skew {

  /** Salted join of a skewed fact side against a dimension: the fact key
    * gains a random salt in [0, salts); the dim side explodes into all
    * salts. One hot key then lands on `salts` reducers instead of one.
    * Equi-join semantics preserved exactly (inner/left joins on the key). */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {

    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id(), rand(42)), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-stage skew-safe aggregation: partial aggregate on (key, salt),
    * then final aggregate on key. Works for any algebraic aggregate the
    * caller expresses twice (partial, merge) — counts/sums here as the
    * common case used by the profile/stats paths. */
  def saltedCountSum(
      df: DataFrame,
      key: String,
      valueCol: String,
      salts: Int): DataFrame =
    // salt from row POSITION, never from the value: a hot key whose values
    // are constant/NULL would hash to one salt and re-concentrate on a
    // single reducer — exactly the straggler this exists to break up.
    // monotonically_increasing_id is stable within a recomputed task, so
    // retries re-derive the same assignment (sum/count unaffected anyway).
    df.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__s").as("sum"))

  /** Skew-safe keep-latest-per-key — the scale-hardened form of the D12
    * row_number dedup. A window puts EVERY row of a hot key on one task (a
    * template domain, a bot user → one straggler at 100 TB); this computes
    * the same answer as two max_by aggregations: partial on (key, salt) —
    * the hot key spreads across `salts` reducers — then final on key over
    * at most `salts` rows per key. "Latest" = greatest orderCols tuple
    * (lexicographic), i.e. row_number() OVER (ORDER BY ... DESC...) = 1;
    * ties beyond orderCols pick an arbitrary row of the tied set, same as
    * the window formulation, so give it a total order for determinism.
    * Salt comes from row position, never from data (a constant-valued hot
    * key would re-concentrate — see saltedCountSum). */
  def saltedKeepLatest(
      df: DataFrame,
      key: String,
      orderCols: Seq[String],
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(orderCols.nonEmpty, "keep-latest needs at least one order column")
    val reserved = Seq("__salt", "__best")
    require(!df.columns.exists(reserved.contains),
      s"saltedKeepLatest reserves column names ${reserved.mkString(",")}")
    val cols = df.columns.toSeq
    val payload = struct(cols.map(col): _*)
    val ord = struct(orderCols.map(col): _*)
    df.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(max_by(payload, ord).as("__best"))
      .groupBy(col(key))
      .agg(max_by(col("__best"),
        struct(orderCols.map(c => col("__best").getField(c)): _*)).as("__best"))
      .select(cols.map(c => col("__best").getField(c).as(c)): _*)
  }

  /** Write both sides bucketed by the join key: subsequent equi-joins on
    * that key read co-located buckets and skip the exchange entirely —
    * .explain shows no ShuffleExchange on either side. Uses the session
    * catalog (saveAsTable is how Spark persists bucketing metadata). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join-key skew diagnostics — the measurement that tells you WHICH of
    * the tools above a key needs before the straggler shows up in
    * production. One map-side-combined count per key (a hot key costs one
    * partial row per task, so the diagnostic itself is skew-proof), a
    * 4-long summary aggregate, and a distributed TakeOrdered for the top
    * keys; the rank window runs over ≤ topK rows. All ratios are exact
    * integer ppm so the report replays bit-for-bit in any engine.
    *
    * Columns: key (string), rank, cnt, share_ppm (key's share of all
    * rows), n_rows, n_keys, hot_over_avg_ppm (max key count over the mean
    * count, the "skew factor"), rec_salts (reducers this key needs so its
    * share of one reducer ≤ an even 1/parallelism split — the `salts`
    * argument saltedJoin/saltedCountSum should get). */
  def skewReport(
      df: DataFrame,
      key: Column,
      topK: Int,
      parallelism: Int): DataFrame =
    finishSkewReport(keyCounts(df, key), topK, parallelism)

  /** The stateful half of skewReport: per-key row counts — one
    * commutative long per key, exactly the aggregation state Structured
    * Streaming maintains incrementally (StreamingSkew reuses this). */
  def keyCounts(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))

  /** The stateless finishing view over a (key, cnt) frame: summary
    * aggregate, distributed top-k, exact-ppm shares and the salt
    * recommendation. Shared verbatim by the batch report and the
    * streaming monitor, so both agree by construction. */
  def finishSkewReport(
      counts: DataFrame,
      topK: Int,
      parallelism: Int): DataFrame = {
    require(topK > 0 && parallelism > 0, "topK and parallelism must be positive")
    val summary = counts.agg(
      sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("cnt")).as("max_cnt"))
    val top = counts.orderBy(desc("cnt"), col("key")).limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("cnt"), col("key"))
    top.crossJoin(broadcast(summary))
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(
        col("key"), col("rank"), col("cnt"),
        expr("(cnt * 1000000) div n_rows").as("share_ppm"),
        col("n_rows"), col("n_keys"),
        expr("(max_cnt * n_keys * 1000000) div n_rows").as("hot_over_avg_ppm"),
        expr(s"(cnt * $parallelism + n_rows - 1) div n_rows").as("rec_salts"))
  }

  /** True when the physical plan of `df` contains a shuffle exchange —
    * the assertion primitive for co-location tests. AQE hides exchanges
    * inside leaf ShuffleQueryStageExec nodes, so the walk must recurse
    * through adaptive plans and materialized stages explicitly. */
  def hasShuffle(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def scan(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => scan(a.executedPlan)
      case _: ShuffleQueryStageExec => true
      case _: ShuffleExchangeLike => true
      case q: QueryStageExec => scan(q.plan)
      case other => other.children.exists(scan)
    }
    scan(df.queryExecution.executedPlan)
  }
}
