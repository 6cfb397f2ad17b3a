package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Change-data-capture application — the consumer-side twin of the
  * reference's DB→Kafka replay (SURVEY §0, §2.8 X6): once a backfill
  * has replayed a table's rows as a keyed change stream, something has
  * to fold that stream back into a queryable snapshot. The reference
  * delegates this to ClickHouse's ReplacingMergeTree (latest row per
  * key wins at merge time, reference `README.md` sink description);
  * these operators ARE that fold, as Spark batch relational algebra:
  *
  *   - [[latestWins]]: collapse a changelog to one row per key — a
  *     single `row_number` window over the key, ordered by the change
  *     sequence descending. One shuffle on the key; at 100 TB the
  *     standard MERGE shape (and with the base snapshot bucketed by
  *     key — [[graft.sources.Bucketing]] — the snapshot side of the
  *     union needs no exchange).
  *   - [[applyChangelog]]: merge a materialized base snapshot with a
  *     new changelog batch — union, latest-wins, drop tombstones.
  *     Incremental-refresh cadence: the nightly job unions yesterday's
  *     snapshot with today's changes; cost is O(snapshot + batch) with
  *     one key shuffle, never a history re-read.
  *   - [[scdHistory]]: the SCD-type-2 view — every change becomes a
  *     validity interval via `lead` over the same key window, current
  *     rows marked. Same single shuffle.
  *
  * The harness changelog is the `events` table read as a change stream
  * over a per-user profile entity: `signup` inserts, `click`/`view`/
  * `purchase` upsert, `error` tombstones ([[opOf]] — the mapping is the
  * operator's declared contract, not an inference). Sequence order is
  * (ts, event_id): event_id breaks equal-timestamp ties so the fold is
  * deterministic under any shuffle order.
  */
object Cdc {

  /** Changelog op code for a harness event type: I/U/D. */
  def opOf(eventType: Column): Column =
    when(eventType === "signup", "I")
      .when(eventType === "error", "D")
      .otherwise("U")

  /** Latest row per key: `row_number` over (key, sequence desc) — the
    * deterministic MERGE/upsert kernel. `seq` columns are applied in
    * order, all descending. */
  def latestWins(changes: DataFrame, key: Seq[String], seq: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(seq.map(col(_).desc): _*)
    changes.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).drop("rk")
  }

  /** Merge a base snapshot with a changelog batch: rows tagged with op
    * I/U/D and a (ts, event_id) sequence; the latest row per key wins
    * and a winning tombstone deletes the key from the snapshot. Base
    * rows carry the sequence they were snapshotted at, so a stale
    * change (late replay of an already-applied event) loses to the
    * snapshot row — idempotent under at-least-once delivery. */
  def applyChangelog(base: DataFrame, changes: DataFrame): DataFrame =
    latestWins(base.unionByName(changes),
      key = Seq("user_id"), seq = Seq("ts", "event_id"))
      .filter(col("op") =!= "D")

  private def asChangelog(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("ts"), col("event_id"),
      opOf(col("event_type")).as("op"),
      col("event_type").as("last_type"), col("value").as("last_value"))

  /** Harness query `cdc_apply`: snapshot the pre-cutoff half of the
    * event stream, then apply the post-cutoff half as a changelog batch
    * through [[applyChangelog]] — exercising the real two-phase merge
    * path, whose result must equal (and is spec'd equal to) a
    * latest-wins fold of the whole stream. */
  def applySnapshot(spark: SparkSession, dir: String,
      cutoff: String = "2024-03-01"): DataFrame = {
    val log = asChangelog(Tables.load(spark, dir, "events"))
    val base = latestWins(log.filter(col("ts") < lit(cutoff).cast("timestamp")),
      key = Seq("user_id"), seq = Seq("ts", "event_id"))
    val batch = log.filter(col("ts") >= lit(cutoff).cast("timestamp"))
    applyChangelog(base, batch)
      .select("user_id", "op", "last_type", "last_value", "ts", "event_id")
      .orderBy("user_id")
  }

  /** Harness query `cdc_history`: the SCD-type-2 validity-interval view
    * of the same changelog — `valid_from` = the change's own sequence
    * point, `valid_to` = the next change's (NULL while current). One
    * window shuffle on the key. */
  def scdHistory(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    // timed source: a change with no sequence point cannot be ordered
    // into a validity chain (cdc_apply's cutoff drops it implicitly)
    asChangelog(Tables.loadTimedEvents(spark, dir))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col("user_id"), col("event_id"), col("op"),
        col("ts").as("valid_from"), col("valid_to"), col("is_current"))
      .orderBy("user_id", "valid_from", "event_id")
  }

  // --------------------------------------- bucket-partitioned upsert store

  /** Salt for the store's bucket hash — ONE definition feeding both the
    * Column form ([[bucketOf]], write path) and the scalar form
    * ([[bucketIdOf]], lookup path); a divergence between the two would
    * silently read the wrong bucket. */
  private val BucketSalt = "cdcb:"

  /** Deterministic key bucket for the partitioned snapshot store. */
  def bucketOf(key: Column, buckets: Int): Column =
    pmod(graft.functions.Hash60.hash60(concat(lit(BucketSalt), key.cast("string"))),
      lit(buckets.toLong))

  /** Driver-side scalar twin of [[bucketOf]] (same md5 prefix + salt —
    * CdcSpec's lookup test pins the two paths agree). */
  def bucketIdOf(key: String, buckets: Int): Long =
    Math.floorMod(graft.functions.GraftHash.md5Prefix60(
      (BucketSalt + key).getBytes("UTF-8")), buckets.toLong)

  /** Merge one changelog batch into a hash-bucket-partitioned snapshot
    * store — the upsert kernel behind the streaming CDC loop, and the
    * shape that scales: the store is partitioned `bucket=<k>` by key
    * hash, and a batch rewrites ONLY the buckets its keys fall in, so
    * merge cost is O(affected partitions), never O(snapshot). At 100 TB
    * the bucket count is sized so one bucket is a few GB; an idle key
    * range is never read or rewritten.
    *
    * The only driver-side read is the affected-bucket id list — bounded
    * by `buckets`, same budget class as the pipeline's 2-row HWM reads.
    * ALL affected buckets merge in ONE Spark job: the base read unions
    * the affected bucket dirs (untouched buckets are never opened), the
    * merged output lands `partitionBy("bucket")` under a dot-prefixed
    * staging root (invisible to partition discovery), and only then
    * does a driver loop swap each bucket in rename-first: the OLD
    * bucket is renamed aside, the staging dir renamed in, and only then
    * is the old dir deleted — at every instant either the old or the
    * new bucket exists, so a crash mid-swap never loses data (a
    * leftover `.old_` dir is retried work, not a hole), and each
    * rename's Boolean result is checked (Hadoop reports most failures
    * that way, not by throwing). The swaps are pure metadata ops, so a
    * batch touching k buckets costs O(affected) I/O but O(1) Spark
    * jobs — not the k sequential read→merge→write job round trips a
    * per-bucket loop would pay (CdcSpec pins the job count constant in
    * k). Replaying the batch is a no-op merge: stale rows lose
    * [[latestWins]], identical rows collapse, so at-least-once delivery
    * cannot corrupt the store. Winning tombstones are RETAINED in the
    * store (op='D' rows) — dropping them would let a late replay of a
    * pre-delete update resurrect the key; readers filter them via
    * [[currentSnapshot]].
    *
    * SINGLE-WRITER CONTRACT: exactly one merge runs against a store at
    * a time (the streaming loop's foreachBatch already serializes
    * batches; any external scheduler must too). Recovery depends on it:
    * a `.staging_*` dir found at merge start is classified as a crashed
    * predecessor's junk and deleted — under a concurrent writer it
    * could be that writer's LIVE output. Concurrent-writer setups need
    * a coordination layer (lock file / table format with commit
    * protocol) on top; this kernel deliberately stays at the
    * one-writer-many-readers level of the reference pipeline. */
  def mergeIntoStore(batch: DataFrame, storeDir: String,
      buckets: Int = 16, batchId: Long = 0L): Unit = {
    val s = batch.sparkSession
    // persist: the batch window feeds the affected-bucket collect AND
    // the merge union — uncached, the whole-batch shuffle would re-run
    val delta = latestWins(batch, Seq("user_id"), Seq("ts", "event_id"))
      .withColumn("bucket", bucketOf(col("user_id"), buckets))
      .persist()
    try {
      val affected = delta.select("bucket").distinct()
        .collect().map(_.getLong(0)).sorted
      val hconf = s.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(storeDir)
      val fs = root.getFileSystem(hconf)
      def renameOrFail(from: org.apache.hadoop.fs.Path,
          to: org.apache.hadoop.fs.Path): Unit =
        require(fs.rename(from, to), s"cdc store swap failed: $from -> $to")
      // recover prior crashed swaps BEFORE reading any base — every
      // aside dir, not just this batch's buckets, so a crash in an
      // earlier batch can't hide a bucket from readers indefinitely:
      // aside present with no live bucket = the crash hit between the
      // two renames — restore it; with a live bucket = the crash hit
      // after the swap completed — the aside copy is superseded
      if (fs.exists(root)) fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(".old_")) {
          val dst = new org.apache.hadoop.fs.Path(root, s"bucket=${n.stripPrefix(".old_")}")
          if (!fs.exists(dst)) renameOrFail(st.getPath, dst)
          else fs.delete(st.getPath, true)
        } else if (n.startsWith(".staging_")) {
          // leftover staging from a crashed batch: that batch replays
          // under at-least-once delivery, so the partial output is junk.
          // Safe ONLY under the single-writer contract (scaladoc) — a
          // concurrent merge's staging dir would be live, not junk
          fs.delete(st.getPath, true)
        }
      }
      val existing = affected.filter(b =>
        fs.exists(new org.apache.hadoop.fs.Path(root, s"bucket=$b")))
      // allowMissingColumns = schema evolution: a batch may carry
      // columns the snapshot predates (or drop ones it has) — the
      // union fills nulls and the rewritten buckets adopt the merged
      // schema as batches touch them; untouched buckets keep theirs
      // (currentSnapshot reads the union via mergeSchema)
      val merged =
        if (existing.isEmpty) delta
        else latestWins(
          s.read.option("mergeSchema", "true")
            .option("basePath", root.toString)
            .parquet(existing.map(b => s"$root/bucket=$b"): _*)
            .withColumn("bucket", col("bucket").cast("long"))
            .unionByName(delta, allowMissingColumns = true),
          Seq("user_id"), Seq("ts", "event_id"))
      val staging = new org.apache.hadoop.fs.Path(root, s".staging_$batchId")
      // cluster by bucket before the partitioned write: each bucket then
      // lands as ONE file instead of one-per-upstream-task (k buckets ×
      // 32 window partitions of file fragments is the small-files
      // problem at nightly cadence); the extra exchange moves the same
      // O(affected) rows the window already shuffled
      merged.repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(staging.toString)
      affected.foreach { b =>
        val src = new org.apache.hadoop.fs.Path(staging, s"bucket=$b")
        val dst = new org.apache.hadoop.fs.Path(root, s"bucket=$b")
        val old = new org.apache.hadoop.fs.Path(root, s".old_$b")
        val hadOld = fs.exists(dst)
        if (hadOld) renameOrFail(dst, old)
        renameOrFail(src, dst)
        if (hadOld) fs.delete(old, true)
      }
      fs.delete(staging, true)
    } finally delta.unpersist()
  }

  /** Read the live snapshot out of a [[mergeIntoStore]] store: partition
    * discovery over the bucket dirs, tombstones filtered at read time
    * (the op filter pushes into the parquet scan). */
  def currentSnapshot(spark: SparkSession, storeDir: String): DataFrame =
    // mergeSchema: buckets evolve independently (see mergeIntoStore) —
    // the snapshot view is the union schema, nulls where a bucket
    // predates a column
    spark.read.option("mergeSchema", "true").parquet(storeDir)
      .filter(col("op") =!= "D")
      .drop("bucket")

  /** Point lookup against the store: the key's bucket is computed
    * driver-side (same md5 prefix as [[bucketOf]]), so the partition
    * filter prunes the read to exactly ONE bucket directory — a
    * key-value get that touches 1/`buckets` of the snapshot. */
  def lookup(spark: SparkSession, storeDir: String, userId: Long,
      buckets: Int = 16): DataFrame = {
    val b = bucketIdOf(userId.toString, buckets)
    spark.read.option("mergeSchema", "true").parquet(storeDir)
      .filter(col("bucket") === b && col("user_id") === userId &&
        col("op") =!= "D")
      .drop("bucket")
  }
}
