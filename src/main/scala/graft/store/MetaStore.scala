package graft.store

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed metadata store (SURVEY §1.1, §7.5): catalog, checks,
  * tables_index, resources_exceptions as keyed/append-only DataFrames.
  *
  * Write semantics (no Delta offline):
  *   - catalog (keyed by resource_id): upsert = full-outer merge rewrite.
  *     At 100 TB posture the catalog stays metadata-sized (~millions of
  *     rows), so a full rewrite is cheap; partition by a stable key-hash
  *     prefix if it ever grows beyond that.
  *   - checks (append-only log): date-partitioned appends — partition
  *     pruning serves the time-windowed queries (D7, retention).
  *   - writes go through a temp dir + atomic-ish swap so a failed job never
  *     leaves a half-written store (single-writer contract, like the
  *     reference's transaction-per-batch).
  */
final class MetaStore(spark: SparkSession, root: String) {

  private def path(name: String) = s"$root/$name"

  /** Physical location of a table (for sinks that manage their own layout,
    * e.g. the idempotent per-batch streaming writer). */
  def tablePath(name: String): String = path(name)

  def exists(name: String): Boolean = Files.exists(Paths.get(path(name)))

  def load(name: String): Option[DataFrame] =
    // mergeSchema: the append-only logs evolve forward (new check columns
    // land over time); without it the read schema is whichever footer wins
    // and newer columns silently vanish
    if (exists(name)) Some(spark.read.option("mergeSchema", "true").parquet(path(name)))
    else None

  /** Overwrite via staging dir: read-modify-write on the same parquet path
    * would fail (Spark cannot overwrite its own input), so land in _staged
    * then swap. */
  def save(name: String, df: DataFrame): Unit = {
    val target = Paths.get(path(name))
    val staged = Paths.get(path(s"_staged_$name"))
    df.write.mode(SaveMode.Overwrite).parquet(staged.toString)
    if (Files.exists(target)) deleteRecursively(target)
    Files.move(staged, target)
  }

  def append(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path(name))
  }

  /** Small-file compaction for an append-only log partition: every append
    * lands at least one file per task, so a hot date partition accumulates
    * hundreds of KB-sized files whose open/footer overhead eventually
    * dominates scans (the classic streaming-sink pathology). Rewrites the
    * partition's files into ceil(bytes / targetFileBytes) files — via
    * coalesce (no shuffle) and the same staging-dir swap as save(), so a
    * failed compaction never corrupts the partition. Compact CLOSED
    * partitions only (single-writer contract — yesterday's dates, not the
    * one being appended). No-op when already compact enough.
    *
    * `partition` is the directory name, e.g. "check_date=2024-01-01".
    * Returns (filesBefore, filesAfter). */
  def compactPartition(
      name: String,
      partition: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetFileBytes > 0, "target file size must be positive")
    val dir = Paths.get(path(name), partition)
    require(Files.exists(dir), s"no such partition: $dir")
    def parquetFiles: Seq[java.nio.file.Path] = {
      val s = Files.list(dir)
      try {
        val it = s.iterator()
        val buf = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
        while (it.hasNext) { val p = it.next(); if (p.toString.endsWith(".parquet")) buf += p }
        buf.toSeq
      } finally s.close()
    }
    val before = parquetFiles
    val bytes = before.map(Files.size).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    if (nOut >= before.size) return (before.size, before.size)
    // files inside a partition dir do not carry the partition column — a
    // direct read+rewrite of the dir preserves the partitioned layout
    val staged = Paths.get(path(s"_staged_compact_$name"))
    spark.read.parquet(dir.toString).coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(staged.toString)
    deleteRecursively(dir)
    Files.move(staged, dir)
    (before.size, parquetFiles.size)
  }

  /** List a partitioned log's partition directory names (for a compaction
    * sweep over closed partitions). */
  def partitionDirs(name: String): Seq[String] = {
    val p = Paths.get(path(name))
    if (!Files.exists(p)) return Nil
    val s = Files.list(p)
    try {
      val it = s.iterator()
      val buf = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) {
        val d = it.next()
        if (Files.isDirectory(d) && d.getFileName.toString.contains("="))
          buf += d.getFileName.toString
      }
      buf.toSeq.sorted
    } finally s.close()
  }

  /** Date-windowed read of a date-partitioned log (checks is partitioned by
    * created_date — the Parquet analog of the reference's created_at index,
    * migrations/main/20240926_add_indexes.sql): the predicate lands on the
    * PARTITION column, so the scan lists only matching date directories.
    * MetaStoreSpec pins the pruned plan. Bounds inclusive; either side
    * optional. */
  def loadDates(
      name: String,
      dateCol: String,
      from: Option[java.time.LocalDate],
      to: Option[java.time.LocalDate]): Option[DataFrame] =
    load(name).map { df =>
      val lower = from.map(d => col(dateCol) >= lit(java.sql.Date.valueOf(d)))
      val upper = to.map(d => col(dateCol) <= lit(java.sql.Date.valueOf(d)))
      (lower ++ upper).foldLeft(df)(_ filter _)
    }

  /** Retention on a date-partitioned log WITHOUT a rewrite: whole partition
    * directories older than the cutoff are dropped, so the cost is
    * O(partitions removed) — no full-table read-and-save like
    * purgeOlderThan (which remains the path for unpartitioned tables).
    * The row count returned reads ONLY the doomed partitions (pruned scan).
    * Single-writer contract, same as the other mutators. */
  def dropDatePartitionsBefore(
      name: String,
      dateCol: String,
      cutoff: java.time.LocalDate): Long = {
    if (!exists(name)) return 0L
    val doomed = loadDates(name, dateCol, None,
      Some(cutoff.minusDays(1))).get
    val dropped = doomed.count()
    import scala.jdk.CollectionConverters._
    val stream = Files.list(Paths.get(path(name)))
    try stream.iterator().asScala
      .filter(p => p.getFileName.toString.startsWith(s"$dateCol="))
      .filter { p =>
        val v = p.getFileName.toString.stripPrefix(s"$dateCol=")
        scala.util.Try(java.time.LocalDate.parse(v)).toOption
          .exists(_.isBefore(cutoff))
      }
      .toSeq.foreach(deleteRecursively)
    finally stream.close()
    dropped
  }

  // ---- catalog ----------------------------------------------------------

  /** D10 upsert (INSERT … ON CONFLICT (resource_id) DO UPDATE): keyed
    * full-outer merge. When an update row matches, its column values win
    * INCLUDING explicit NULLs — `SET col = excluded.col` semantics; the
    * reference relies on this to reset `status` to NULL
    * (preprocess_check_data.py:61). A plain coalesce would silently keep
    * the stale value.
    *
    * `onMatchUpdate` restricts which columns the DO-UPDATE clause touches
    * (the catalog loader's `SET dataset_id, url, deleted` at cli.py:100-112
    * deliberately leaves harvest_modified_at/priority/status alone on
    * existing rows); empty = update every provided column. Columns present
    * only in `updates` are added to the table (null for untouched rows) —
    * schema evolves forward like the reference's migrations. */
  def upsert(name: String, updates: DataFrame, key: String,
      onMatchUpdate: Seq[String] = Nil): Unit = {
    val merged = load(name) match {
      case None => updates
      case Some(existing) =>
        val allCols = existing.columns ++
          updates.columns.filterNot(existing.columns.contains)
        val e = existing.alias("e")
        val u = updates.alias("u")
        val joined = e.join(u, col(s"e.$key") === col(s"u.$key"), "full_outer")
        val insertOnly = col(s"e.$key").isNull
        val matchSet: Set[String] =
          if (onMatchUpdate.isEmpty) updates.columns.toSet else onMatchUpdate.toSet
        val projected = allCols.map { c =>
          if (c == key) coalesce(col(s"u.$key"), col(s"e.$key")).as(c)
          else if (!updates.columns.contains(c)) col(s"e.$c").as(c)
          else if (!existing.columns.contains(c)) col(s"u.$c").as(c)
          else if (matchSet.contains(c))
            when(col(s"u.$key").isNotNull, col(s"u.$c")).otherwise(col(s"e.$c")).as(c)
          else when(insertOnly, col(s"u.$c")).otherwise(col(s"e.$c")).as(c)
        }
        joined.select(projected.toIndexedSeq: _*)
    }
    // materialize before the swap: the merged plan still reads the old files
    val rows = merged.cache()
    rows.count()
    save(name, rows)
    rows.unpersist()
  }

  /** D11 catalog-wide soft delete (cli.py:88): deleted=true everywhere;
    * subsequent upserts resurrect surviving rows. */
  def softDeleteAll(name: String): Unit =
    load(name).foreach { df =>
      val marked = df.withColumn("deleted", lit(true)).cache()
      marked.count()
      save(name, marked)
      marked.unpersist()
    }

  /** D14 retention purge (cli.py:271-283): keep rows newer than the cutoff,
    * return how many were dropped. */
  def purgeOlderThan(name: String, tsCol: String, cutoff: java.sql.Timestamp): Long =
    load(name) match {
      case None => 0L
      case Some(df) =>
        val kept = df.filter(col(tsCol) >= lit(cutoff)).cache()
        val dropped = df.count() - kept.count()
        save(name, kept)
        kept.unpersist()
        dropped
    }

  /** C7/D9 purge of parsed tables no longer referenced by a live catalog row:
    * tables_index anti-join the grouped catalog on md5(url). Returns the
    * orphaned parsing_table names (caller deletes the parquet dirs). */
  def orphanedTables(tablesIndex: DataFrame, catalog: DataFrame): DataFrame = {
    val live = catalog.groupBy("url")
      .agg(min(when(col("deleted"), 1).otherwise(0)).as("all_deleted"))
      .filter(col("all_deleted") === 0)
      .select(md5(col("url")).as("live_table"))
    tablesIndex.select(col("parsing_table")).distinct()
      .join(live, col("parsing_table") === col("live_table"), "left_anti")
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      try stream.iterator().asScala.toSeq.reverseIterator
        .foreach(f => Files.deleteIfExists(f))
      finally stream.close()
    }
  }
}
