package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel
import graft.etl.Star.{withFact, withFactSem}

/** Star materialization: surrogate-key dimension builds (A10, the batch
  * re-expression of the reference's row-at-a-time get-or-create at
  * ETL_FINAL.py:128-134) and the write/full-refresh path (A12/A17/A19/A20,
  * ETL_FINAL.py:42-45,220-223,270-273) the reference performs with
  * DROP DATABASE + per-row INSERTs.
  *
  * Surrogate ids equal `dense_rank` over the natural key (SURVEY.md §7.4):
  * deterministic across engines and runs, unlike
  * `monotonically_increasing_id`. They are computed WITHOUT a
  * single-partition window ([[withSurrogateId]]): student/course dim
  * cardinality scales with the data, so a global `Window.orderBy` would
  * funnel every row through one task at 100×.
  *
  * Writes are parquet `overwrite` (Delta/Iceberg jars are unresolvable in
  * this container — evidence in SURVEY.md §8; the MERGE-INTO upsert
  * semantics are provided on parquet by [[upsertDim]]); facts are
  * partitioned by `tahun` so time-range queries prune partitions.
  * Overwrite-per-run = the reference's full-refresh semantics.
  */
object StarBuilder {
  type Q = (SparkSession, String) => DataFrame

  /** Write parallelism per `tahun` partition (local[32] tuning; a cluster
    * deployment sizes this to executors × cores / distinct years). */
  val filesPerYear: Int = 4

  /** Scale-safe deterministic surrogate keys: ids equal the global rank of
    * the natural key, computed two-phase instead of with a partitionless
    * window. Phase 1 range-partitions the distinct keys and ranks locally
    * (`row_number` over a `spark_partition_id`-partitioned window — every
    * task works). Phase 2 collects the ≤ numShufflePartitions per-partition
    * counts to the driver (the bounded `zipWithIndex` pattern) and
    * broadcast-joins cumulative offsets back. `offset + local rank` equals
    * the global rank because range partitions are ordered by the key.
    *
    * The counts job and the rank job MUST observe the SAME `_pid`
    * assignment: `repartitionByRange` samples its input once per query
    * execution, so two separate executions of `parted` can draw different
    * range boundaries and assign rows to different `_pid`s — offsets from
    * one partitioning applied to ranks from another would produce wrong or
    * duplicate ids, and rows landing in a `_pid` absent from the counts
    * run would be dropped by the offset join. The partitioning is therefore
    * pinned: `parted` is persisted and materialized by a `count()` BEFORE
    * the counts collect, so both jobs (and nothing else — the result is
    * eagerly `localCheckpoint`ed and `parted` unpersisted) read the one
    * cached assignment. The eager checkpoint also means downstream
    * consumers (writeAll, factNilaiMk) re-read materialized id rows
    * instead of re-running the sampling + window per action.
    *
    * Cluster path (executor-loss safety): a MEMORY_AND_DISK persist is
    * only as durable as its executors — on loss, the recompute re-samples
    * range boundaries and could assign different `_pid`s. Two defenses:
    * (1) the `graft.surrogate.checkpoint.dir` session conf (or the
    * `checkpointDir` param) switches the pin to a RELIABLE
    * `df.checkpoint` — the partition assignment is written to stable
    * storage and recomputes read it back verbatim; the data is only the
    * distinct-key set, bounded by dim cardinality, not fact volume.
    * (2) Unconditionally, the result is invariant-checked (row count
    * preserved AND ids distinct) so a re-sampled partitioning fails
    * loudly instead of silently dropping or duplicating surrogate ids —
    * both jobs run on the already-materialized checkpoint, so they cost
    * dim-cardinality scans, not a pipeline re-run. */
  private[graft] def withSurrogateId(df: DataFrame, idCol: String, keys: Seq[String],
      checkpointDir: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ckptDir = checkpointDir.orElse(
      Option(spark.conf.get("graft.surrogate.checkpoint.dir", null)).filter(_.nonEmpty))
    val keyCols = keys.map(col)
    val parted0 = df.repartitionByRange(keyCols: _*).withColumn("_pid", spark_partition_id())
    // pin ONE partitioning before reading _pid twice
    val parted = ckptDir match {
      case Some(dir) =>
        spark.sparkContext.setCheckpointDir(dir)
        parted0.checkpoint(true) // reliable: survives executor loss
      case None =>
        val p = parted0.persist(StorageLevel.MEMORY_AND_DISK)
        p.count()
        p
    }
    val w = Window.partitionBy("_pid").orderBy(keyCols: _*)
    val counts = parted.groupBy("_pid").agg(count(lit(1)).as("_cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = counts.map(_._2).sum
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, cnt)) => (pid, acc + cnt) }
      .init.zip(counts).map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = offsets.toSeq.toDF("_pid", "_off")
    val ranked = parted.withColumn("_rn", row_number().over(w).cast("long"))
      .join(broadcast(offDf), "_pid")
      .withColumn(idCol, col("_off") + col("_rn"))
      .drop("_pid", "_rn", "_off")
      .localCheckpoint(true)
    // invariants over the materialized result: a drifted partitioning
    // either drops rows (a _pid missing from the offsets join) or
    // collides ids (rows moved between pinned counts) — both fatal for a
    // surrogate key, neither acceptable silently. One agg job over the
    // checkpointed dim-cardinality rows (q48, the surrogate-build bench
    // sentinel, pays this per rep — keep it a single job).
    val inv = ranked.agg(count(lit(1)).as("n"), count_distinct(col(idCol)).as("d")).head()
    val (rankedCnt, distinctIds) = (inv.getLong(0), inv.getLong(1))
    require(rankedCnt == total && distinctIds == rankedCnt,
      s"withSurrogateId: partitioning drifted between jobs ($rankedCnt ranked rows vs $total counted, " +
        s"$distinctIds distinct ids) — set graft.surrogate.checkpoint.dir to pin the " +
        "partitioning on reliable storage")
    if (ckptDir.isEmpty) parted.unpersist(false)
    ranked
  }

  /** Session-scoped memo of the surrogate-keyed dims
    * ([[graft.SessionMemo]]): the write path and the fact FK join-back
    * each consume every dim, and [[withSurrogateId]] eagerly materializes
    * its result — build each dim once per (session, dir) and hand out the
    * checkpointed frame. The cross-run form of this cache is the warehouse
    * itself. (q48 bypasses this memo on purpose: its bench number must
    * reflect the surrogate-key BUILD, not a cache read.) */
  private def memoDim(spark: SparkSession, dir: String, key: String)(build: => DataFrame): DataFrame =
    graft.SessionMemo(spark, dir, s"dim:$key")(build)(identity)

  /** Dim_Waktu analog (ETL_FINAL.py:74-79): id_waktu = rank over
    * (tahun, semester) — chronological because 'Gasal' < 'Genap'. */
  private def buildDimWaktu(spark: SparkSession, dir: String): DataFrame =
    withSurrogateId(
      Star.fact(spark, dir).select("tahun", "semester").distinct(),
      "id_waktu", Seq("tahun", "semester"))
      .select("id_waktu", "tahun", "semester")

  def dimWaktu(spark: SparkSession, dir: String): DataFrame =
    memoDim(spark, dir, "waktu")(buildDimWaktu(spark, dir))

  /** Dim_Nilai analog (ETL_FINAL.py:82-86): the seeded grade map (A11). */
  def dimNilai(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Star.gradeWeights.zipWithIndex
      .map { case ((h, b), i) => (i + 1L, h, b) }
      .toDF("id_nilai", "huruf", "bobot")
  }

  /** Dim_MataKuliah analog: courses seen in the fact, surrogate-keyed.
    * Course cardinality scales with the data → two-phase ranking. */
  def dimMataKuliah(spark: SparkSession, dir: String): DataFrame =
    memoDim(spark, dir, "mk") {
      withSurrogateId(
        Star.factWithTahap(spark, dir).select("course", "tahap").distinct(),
        "id_mk", Seq("course"))
        .select("id_mk", "course", "tahap")
    }

  /** Dim_Mahasiswa analog: [[Star.dimMahasiswa]] + surrogate id.
    * Student cardinality scales with the data → two-phase ranking. */
  def dimMahasiswa(spark: SparkSession, dir: String): DataFrame =
    memoDim(spark, dir, "mhs") {
      withSurrogateId(Star.dimMahasiswa(spark, dir), "id_mahasiswa", Seq("student"))
    }

  /** A10's incremental form (SURVEY.md §2.A): `MERGE INTO dim USING incoming
    * ON natural-key WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT`,
    * emulated on parquet because Delta is unresolvable here (SURVEY.md §8).
    *
    * Semantics: rows whose natural key already exists keep their surrogate
    * id verbatim and take the incoming attribute values (UPDATE); genuinely
    * new keys get ids `max(existing id) + two-phase rank` (INSERT); keys
    * absent from the increment are kept unchanged (no DELETE clause, like
    * the reference's get-or-create). Consequences checked by StarSpec:
    * ids are stable across any split of the input into increments, and
    * re-applying the same increment is a no-op.
    *
    * `existing` must carry `keys :+ idCol` plus the attribute columns of
    * `incoming`; at cluster scale the join is a broadcast (small increment)
    * or a bucketed equi-join on the natural key. */
  def upsertDim(existing: DataFrame, incoming: DataFrame, idCol: String, keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    // MERGE INTO fails fast when multiple source rows match one target row
    // ("Cannot perform Merge as multiple source rows matched..."); without
    // this check a duplicated natural key would silently multiply MATCHED
    // rows and hand two ids to one key via the insert rank.
    require(
      incoming.groupBy(keyCols: _*).agg(count(lit(1)).as("_n")).where(col("_n") > 1).isEmpty,
      s"upsertDim: multiple incoming rows share a natural key (${keys.mkString(", ")}); " +
        "MERGE semantics require the source to be unique on the merge key")
    val maxId = existing.agg(coalesce(max(col(idCol)), lit(0L)).as("m")).head().getLong(0)
    val ids = existing.select((keyCols :+ col(idCol)): _*)
    val updated = incoming.join(ids, keys) // MATCHED: incoming attrs, existing id
    val untouched = existing.join(incoming.select(keyCols: _*), keys, "left_anti")
    val inserted = withSurrogateId(incoming.join(ids.select(keyCols: _*), keys, "left_anti"),
        idCol, keys)
      .withColumn(idCol, col(idCol) + lit(maxId))
    updated.unionByName(untouched).unionByName(inserted)
  }

  /** Fact_Nilai_MK analog with surrogate FKs (A12): fact joined back to
    * the dims on natural keys — the set-oriented form of get-or-create. */
  def factNilaiMk(spark: SparkSession, dir: String): DataFrame =
    Star.fact(spark, dir)
      .join(broadcast(dimWaktu(spark, dir)), Seq("tahun", "semester"))
      .join(broadcast(dimNilai(spark).select("id_nilai", "huruf")), Seq("huruf"))
      .select(col("student"), col("course"), col("tahun"), col("id_waktu"),
        col("id_nilai"), col("sks"), col("bobot"), col("bobot_matkul"))

  /** Full-refresh star write (A17/A19/A20): overwrite the warehouse dir;
    * facts partitioned by tahun for partition pruning. */
  def writeAll(spark: SparkSession, dir: String, warehouse: String): Unit =
    writeTables(spark, dir, warehouse)

  /** The star tables written under one target root — shared by the
    * flat [[writeAll]] layout and each [[writeAllVersioned]] snapshot
    * (private[graft] so the spec can simulate a writer killed before
    * its commit marker lands). */
  private[graft] def writeTables(spark: SparkSession, dir: String, warehouse: String): Unit = {
    // dim_waktu/dim_nilai have bounded cardinality (calendar × 2 semesters,
    // fixed grade scale) → one file each is correct at any scale. The
    // student/course dims scale WITH the data — the same argument that bans
    // a global rank window bans a coalesce(1) single-task write — so they
    // are written straight from the ranked range partitions (multi-task,
    // id-sorted files).
    dimWaktu(spark, dir).coalesce(1).write.mode("overwrite").parquet(s"$warehouse/dim_waktu")
    dimNilai(spark).coalesce(1).write.mode("overwrite").parquet(s"$warehouse/dim_nilai")
    dimMataKuliah(spark, dir).write.mode("overwrite").parquet(s"$warehouse/dim_matakuliah")
    dimMahasiswa(spark, dir).write.mode("overwrite").parquet(s"$warehouse/dim_mahasiswa")
    // hash-repartition on (tahun, student-salt): each year is written by up
    // to filesPerYear tasks. Plain repartition(col("tahun")) serializes an
    // entire year through ONE task — a straggler/skew killer at 100× — and
    // range partitioning's sampling pass re-reads the fact per write. The
    // bounded salt keeps both write parallelism (years × filesPerYear
    // tasks) and file count (≤ filesPerYear files per tahun directory);
    // at cluster scale filesPerYear is sized to executor count.
    def saltedByYear(df: DataFrame): DataFrame =
      df.repartition(col("tahun"), pmod(col("student"), lit(filesPerYear)))
    saltedByYear(factNilaiMk(spark, dir)).write.mode("overwrite")
      .partitionBy("tahun").parquet(s"$warehouse/fact_nilai_mk")
    saltedByYear(Star.semesterFact(spark, dir)).write.mode("overwrite")
      .partitionBy("tahun").parquet(s"$warehouse/fact_nilai_semester")
  }

  // ---------------------------------------------------------------------------
  // Snapshot-versioned warehouse (the time-travel analog)
  // ---------------------------------------------------------------------------

  /** Version numbers with a commit marker in `$warehouse/_log`,
    * ascending. The marker file — not the data directory — is the unit
    * of visibility: a `v=<n>` directory without its marker is an
    * aborted write that no reader ever resolves. */
  def committedVersions(warehouse: String): Seq[Long] =
    Option(new java.io.File(s"$warehouse/_log").listFiles())
      .map(_.toSeq.map(_.getName)
        // strict <digits>.commit match: anything else in _log (a crashed
        // writer's leftover, an editor temp file) must be ignored, not
        // crash every reader forever on toLong
        .filter(_.matches("^[0-9]+\\.commit$"))
        .map(_.stripSuffix(".commit").toLong).sorted)
      .getOrElse(Seq.empty)

  def latestVersion(warehouse: String): Option[Long] =
    committedVersions(warehouse).lastOption

  /** The commit history: (version, commit epoch-millis), log order. The
    * commit INSTANT is the `_log` marker's BODY — [[commitMarker]]
    * stamps the publish-time epoch-millis into the marker at creation,
    * so TIMESTAMP-AS-OF boundaries survive coarse filesystem timestamp
    * granularity (1 s on some filesystems) and mtime-losing restores
    * (cp without -p, object-store downloads). Markers written before
    * r11 are zero-byte; those fall back to mtime (r10 advice — the
    * filter+max resolution in [[versionAsOf]] already tolerates the
    * reordering a fallback can introduce). Planning-sized: one row per
    * commit. */
  def history(warehouse: String): Seq[(Long, Long)] =
    committedVersions(warehouse).map { v =>
      val f = new java.io.File(s"$warehouse/_log/$v.commit")
      val body = try new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim
      catch { case _: java.io.IOException => "" }
      // trust the body only when it parses as a PLAUSIBLE epoch-millis
      // (2001..2099) — a truncated prefix of a current epoch ("17" of
      // "1723…") has too few digits and falls back to mtime instead of
      // time-traveling the marker to 1970
      val epoch =
        if (body.matches("^[0-9]{12,13}$")) Some(body.toLong).filter(t =>
          t > 978307200000L && t < 4102444800000L)
        else None
      v -> epoch.getOrElse(f.lastModified())
    }

  /** Resolve the snapshot that was LATEST as of `epochMillis` — the
    * `TIMESTAMP AS OF` half of time travel ([[readAt]]'s version pin is
    * the `VERSION AS OF` half): the HIGHEST version whose commit marker
    * landed at or before the instant. Commit mtimes are monotone along
    * the version order on a live warehouse (markers are created in
    * claim order and never rewritten), but a restore that lost mtimes
    * (cp without -p, an object-store download) breaks that — so the
    * resolution filters and takes the max version rather than
    * takeWhile-scanning, which would silently stop at the first
    * out-of-order marker and time-travel to a stale snapshot. Throws if
    * the instant predates every commit — "the table did not exist yet"
    * must not silently serve the oldest snapshot. */
  def versionAsOf(warehouse: String, epochMillis: Long): Long = {
    val h = history(warehouse)
    require(h.nonEmpty, s"no committed version in $warehouse")
    h.filter(_._2 <= epochMillis).map(_._1).maxOption.getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot of $warehouse existed at $epochMillis " +
          s"(first commit: v=${h.head._1} at ${h.head._2})"))
  }

  /** [[readAt]] pinned by instant instead of version number. */
  def readAsOf(spark: SparkSession, warehouse: String, table: String,
      epochMillis: Long, mergeSchema: Boolean = false): DataFrame =
    readAt(spark, warehouse, table,
      Some(versionAsOf(warehouse, epochMillis)), mergeSchema)

  /** Snapshot-versioned star write — the lakehouse-table property the
    * flat [[writeAll]] lacks (Delta/Iceberg being unresolvable offline,
    * SURVEY §8): every refresh lands in a fresh `$warehouse/v=<n>/`
    * snapshot, and ONLY after every table directory is fully written
    * does the commit marker `_log/<n>.commit` appear, its body the
    * commit epoch-millis (the
    * [[publishSnapshot]] claim-then-commit protocol: snapshot staged in
    * a writer-private dot-dir, version number claimed by atomic rename,
    * marker created create-if-absent; an object store swaps the rename
    * and createFile for conditional PUTs). Readers resolve versions
    * exclusively through the log, so
    *  - a writer killed mid-snapshot leaves either an invisible staging
    *    dot-dir or a claimed-but-uncommitted `v=<n>` orphan — both
    *    CHANGE NOTHING for readers (StarSpec proves the orphan case),
    *    and later writers claim past the orphan,
    *  - a reader pinned to version n ([[readAt]]) sees immutable data
    *    forever — snapshots are never rewritten, the time-travel
    *    contract,
    *  - concurrent readers of "latest" never observe a half-written
    *    refresh (the full-overwrite writeAll's failure mode), and
    *    concurrent WRITERS can never interleave into one snapshot or
    *    silently overwrite each other's commit.
    * Returns the committed version number. Old snapshots are retained
    * for time travel; a retention sweep would delete v-dirs strictly
    * below the oldest pinned version, log-first. */
  def writeAllVersioned(spark: SparkSession, dir: String, warehouse: String): Long = {
    val txn = stageDir(warehouse)
    writeTables(spark, dir, txn.toString)
    publishSnapshot(warehouse, txn)
  }

  /** A writer-private staging directory for one snapshot attempt —
    * dot-prefixed so readers, [[Compact.leafDirs]] and the log scan all
    * ignore it until [[publishSnapshot]] renames it into place. */
  private def stageDir(warehouse: String): java.io.File = {
    val f = new java.io.File(warehouse, s".txn_${java.util.UUID.randomUUID}")
    f.mkdirs()
    f
  }

  /** Two-phase publish of a fully-written staging dir: (1) CLAIM a
    * version number by atomically renaming the dir to `v=<n>` — rename
    * fails if the target exists, so two concurrent writers can never
    * interleave into one snapshot directory; the loser just claims the
    * next number. (2) COMMIT by create-if-absent of the `_log` marker —
    * `Files.createFile` is the conflict-DETECTING primitive the classic
    * protocol needs (a rename-over would silently replace a concurrent
    * committer's marker). A crash between the phases leaves a claimed
    * but uncommitted `v=<n>` orphan that readers never resolve and
    * later writers skip past. */
  /** The active storage protocol (the [[CommitProtocol]] seam): POSIX
    * rename by default; swapped per-scope by [[withCommitProtocol]]
    * (the concurrency specs run both implementations through the same
    * publish logic). */
  @volatile private var commitProtocol: CommitProtocol = RenameCommitProtocol

  /** Run `body` with `p` as the storage commit protocol, restoring the
    * default after — the deployment/test seam for the conditional-PUT
    * implementation. Process-global: callers are the specs (serial) and
    * a deployment's one-time setup, not concurrent query code. */
  def withCommitProtocol[T](p: CommitProtocol)(body: => T): T = {
    val prev = commitProtocol
    commitProtocol = p
    try body finally commitProtocol = prev
  }

  private def publishSnapshot(warehouse: String, txn: java.io.File): Long = {
    var v = latestVersion(warehouse).getOrElse(0L) + 1
    // a lost claim means a concurrent writer owns v=<n>: claim the next
    // number (full-refresh snapshots are self-contained, any number works)
    while (!commitProtocol.claimVersion(warehouse, txn, v)) v += 1
    commitMarker(warehouse, v)
  }

  /** Publish a staging dir as EXACTLY version `v` — the commit primitive
    * for read-modify-write writers ([[deleteWhere]], [[compactVersioned]],
    * the streaming CDC sink), whose staged content DERIVES from the
    * version they read: claiming "the next free number" after a
    * concurrent commit would silently erase that commit from the latest
    * view (a lost update). A full-refresh writer's snapshot is
    * self-contained, so [[publishSnapshot]]'s claim-next-free stays
    * correct there. On conflict the staging dir is deleted and a
    * ConcurrentModificationException asks the caller to re-read and
    * retry — optimistic concurrency, the Delta/Iceberg commit rule. */
  private def publishSnapshotExactly(warehouse: String, txn: java.io.File,
      v: Long): Long = {
    if (!commitProtocol.claimVersion(warehouse, txn, v)) {
      // a lost exact claim is a CONFLICT, never a retry-with-next: the
      // staged content derives from v−1 and would erase the winner
      Compact.deleteRecursively(txn)
      val committed = committedVersions(warehouse).contains(v)
      throw new java.util.ConcurrentModificationException(
        if (committed)
          s"version $v of $warehouse was committed by a concurrent writer " +
            "since this read-modify-write began; re-read latest and retry"
        else
          s"version $v of $warehouse is claimed but UNCOMMITTED — either a " +
            "concurrent writer mid-commit, or a crashed writer's orphan; if " +
            "no writer is live (e.g. on single-writer stream restart), run " +
            "recoverUncommitted and retry")
    }
    commitMarker(warehouse, v)
  }

  /** Delete claimed-but-uncommitted version directories — the recovery a
    * crashed EXACT-version writer ([[deleteWhere]], [[compactVersioned]],
    * the streaming CDC sink) needs: its orphan claim blocks every retry
    * of `cur + 1` forever (the claim-next-free full-refresh writers just
    * skip past orphans). ONLY safe when no other writer can be mid-commit
    * — the caller asserts that (the standard case: a single-writer CDC
    * stream restarting after a crash, before the query starts; an
    * object-store deployment replaces the whole claim/commit pair with
    * conditional PUTs and has no orphan window at all). Returns the
    * removed version numbers. */
  def recoverUncommitted(warehouse: String): Seq[Long] = {
    val entries = Option(new java.io.File(warehouse).listFiles()).getOrElse(Array.empty)
    // pre-claim crashes leave snapshot-sized .txn_ staging dirs no reader
    // or writer ever touches — the recovery sweep is the one place that
    // reclaims them
    entries.filter(d => d.isDirectory && d.getName.startsWith(".txn_"))
      .foreach(Compact.deleteRecursively)
    val committed = committedVersions(warehouse).toSet
    entries
      .filter(d => d.isDirectory && d.getName.matches("^v=[0-9]+$"))
      .map(d => d -> d.getName.stripPrefix("v=").toLong)
      .filterNot { case (_, v) => committed(v) }
      .map { case (d, v) => Compact.deleteRecursively(d); v }
      .sorted.toSeq
  }

  /** Streaming-transaction ledger — the Delta `txn` action's role: a
    * committed (stream id, batch id) pair recorded as `_log/txn.<id>.<batch>`
    * (the strict `<digits>.commit` scan ignores it), holding the version
    * that batch produced. [[txnVersion]] is how an at-least-once sink
    * turns replay into a no-op at COMMIT level (the r9 limit: without a
    * ledger a replayed batch re-commits an identical-content version).
    * The marker lands AFTER the version commit, so a crash between the
    * two degrades exactly to the old content-level idempotence — a
    * duplicate version, never wrong data — and the next success
    * re-marks. Create-if-absent keeps a concurrent double-replay from
    * double-marking. */
  def txnMark(warehouse: String, streamId: String, batchId: Long, v: Long): Unit = {
    require(!streamId.contains("/") && !streamId.contains("."),
      s"streamId must be path- and ledger-safe: $streamId")
    val log = new java.io.File(s"$warehouse/_log")
    log.mkdirs()
    // content-atomic create-if-absent (the commit-marker fix applied to
    // the ledger too): a racing [[txnVersion]] reader must never parse
    // a partially written version number
    PosixAtomic.createWithContent(
      new java.io.File(log, s"txn.$streamId.$batchId").toPath,
      v.toString.getBytes("UTF-8"))
    ()
  }

  /** The version a (stream, batch) pair committed, if its ledger marker
    * exists — None means the batch never committed (or crashed before
    * marking, which replays safely). */
  def txnVersion(warehouse: String, streamId: String, batchId: Long): Option[Long] = {
    val f = new java.io.File(s"$warehouse/_log/txn.$streamId.$batchId")
    if (!f.isFile) None
    else Some(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim.toLong)
  }

  private def commitMarker(warehouse: String, v: Long): Long = {
    // conditional create keeps create-if-absent as the atomic commit
    // step; the body carries the commit epoch-millis so [[history]]
    // does not depend on filesystem mtime granularity. Both protocol
    // implementations are CONTENT-atomic (staged body linked/moved into
    // the visible name), so a reader never observes a partial body;
    // history() additionally range-checks the parsed epoch as defense
    // in depth before trusting it over mtime.
    if (!commitProtocol.putCommitMarker(warehouse, v,
        String.valueOf(System.currentTimeMillis()).getBytes("UTF-8")))
      throw new java.nio.file.FileAlreadyExistsException(
        s"$warehouse/_log/$v.commit")
    v
  }

  /** Copy-on-write snapshot compaction — OPTIMIZE as a COMMIT instead
    * of an in-place rewrite: bin-pack the latest committed snapshot's
    * tables into a NEW version directory and commit it through the
    * same marker protocol, so a reader of "latest" sees either the old
    * snapshot or the fully-committed compacted one — never the
    * intermediate state the in-place [[Compact.compact]] documents as
    * its caveat (and version pins keep working: the source snapshot is
    * untouched). Each partition leaf keeps its relative path
    * (`fact_nilai_mk/tahun=…` stays that leaf); leaves already at or
    * under the ⌈Σbytes/target⌉ count are byte-copied without
    * decode/re-encode, fragmented ones repacked with [[Compact]]'s
    * formula. Returns the committed new version. */
  def compactVersioned(spark: SparkSession, warehouse: String,
      targetBytes: Long, blockSize: Int = 128 * 1024 * 1024): Long = {
    val cur = latestVersion(warehouse).getOrElse(
      throw new IllegalArgumentException(s"no committed version in $warehouse"))
    val srcRoot = new java.io.File(s"$warehouse/v=$cur")
    val txn = stageDir(warehouse)
    val tables = Option(srcRoot.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory &&
        !d.getName.startsWith("_") && !d.getName.startsWith("."))
    tables.foreach { t =>
      if (dvDir(srcRoot, t.getName).isDirectory) {
        // a deletion-vector sidecar addresses rows by (file, position):
        // any repack would break those addresses, so compaction is where
        // deletes MATERIALIZE — rewrite the live view, drop the sidecar.
        // Output sizing scales the physical bytes by the live-row
        // fraction (a mostly-deleted table must not keep its pre-delete
        // file count), and a `k=v` directory layout is preserved via
        // partitionBy so partition pruning survives the rewrite.
        val leaves = Compact.leafDirs(t)
        val bytes = leaves.flatMap(l => Compact.dataFiles(l)).map(_.length()).sum
        val partCols = srcRoot.toPath.relativize(leaves.head.toPath).toString
          .split("/").drop(1).filter(_.contains("=")).map(_.split("=", 2)(0)).toSeq
        // mergeSchema: a DV-carrying table that also evolved by append
        // must materialize the UNION schema in the rewrite, not whichever
        // footer schema inference happens to pick (Compact.packInto
        // carries the same guard on the no-DV path)
        val live = graft.Ckpt.eager(
          applyDv(spark, srcRoot, t.getName, mergeSchema = true))
        val physRows = math.max(1L, spark.read.parquet(t.toString).count())
        val liveRows = live.count()
        // double arithmetic: bytes × rows overflows Long at the 100 TB
        // scale this exists for (2e11 bytes × 5e7 rows > Long.MaxValue)
        val liveBytes = bytes.toDouble * liveRows / physRows
        val nOut = math.max(1L, math.ceil(liveBytes / targetBytes).toLong).toInt
        if (liveRows == 0L)
          // a fully-deleted table: dynamic partitionBy of an empty frame
          // writes NO schema-bearing file (the dir would be unreadable);
          // the plain write leaves one empty schema file
          live.write.mode("overwrite").parquet(new java.io.File(txn, t.getName).toString)
        else if (partCols.isEmpty)
          live.repartition(nOut).write.mode("overwrite")
            .option("parquet.block.size", blockSize.toString)
            .parquet(new java.io.File(txn, t.getName).toString)
        else {
          // one task per partition value keeps rows with their leaf; the
          // per-file row cap re-establishes target-sized files WITHIN a
          // big leaf (compaction-throughput, not query-path, parallelism)
          val rowsPerFile = math.max(1L,
            (targetBytes / math.max(1.0, bytes.toDouble / physRows)).toLong)
          live.repartition(partCols.map(col): _*)
            .write.mode("overwrite")
            .option("parquet.block.size", blockSize.toString)
            .option("maxRecordsPerFile", rowsPerFile.toString)
            .partitionBy(partCols: _*)
            .parquet(new java.io.File(txn, t.getName).toString)
        }
      } else Compact.leafDirs(t).foreach { leaf =>
        val rel = srcRoot.toPath.relativize(leaf.toPath).toString
        Compact.packInto(spark, leaf, new java.io.File(txn, rel), targetBytes, blockSize)
      }
      // a stats manifest addresses files BY NAME: any repack leaves it
      // pointing at files that no longer exist, so the compacted
      // snapshot regenerates its manifest before the commit (stats
      // columns are recoverable from the manifest's own min_* schema).
      // Cheap next to the repack itself, and atomic with it — readers
      // resolve either (old files, old stats) or (new files, new
      // stats), never a mix.
      val srcStats = new java.io.File(t, "_idx/stats")
      if (srcStats.isDirectory) {
        val cols = DataSkipping.statsColsOf(
          spark.read.parquet(srcStats.toString).columns.toIndexedSeq)
        DataSkipping.writeStats(spark, new java.io.File(txn, t.getName).toString, cols)
      }
      // the bloom sidecar addresses files by name too; its key column is
      // pinned in the manifest itself (`key_col` rides every row), so the
      // compacted snapshot regenerates it with the same atomicity (r10 —
      // closes the r9 "bloom follows the serving-index rebuild rule"
      // limitation for warehouse tables; the ANN indexes keep that rule,
      // and Compact.resort proves their searches survive a repack)
      val srcBloom = new java.io.File(t, "_idx/bloom")
      if (srcBloom.isDirectory) {
        val keys = spark.read.parquet(srcBloom.toString)
          .select("key_col").distinct().collect().map(_.getString(0)).toSeq
        require(keys.size == 1,
          s"bloom sidecar under ${t.getName} indexes ${keys.mkString(", ")} — one key per sidecar")
        DataSkipping.writeBloom(spark,
          new java.io.File(txn, t.getName).toString, keys.head)
      }
    }
    // compaction derives from v=cur: same lost-update rule as deleteWhere
    publishSnapshotExactly(warehouse, txn, cur + 1)
  }

  /** Retention sweep: keep the newest `keep` committed versions, drop
    * the rest — LOG MARKER FIRST (the version disappears from
    * resolution in one delete), THEN the orphaned data directory, so a
    * crash mid-vacuum leaves only invisible orphans, never a
    * resolvable version with missing data. Returns the dropped
    * versions. The caller owns the pin contract: vacuum only below the
    * oldest version any reader still pins. */
  def vacuumVersions(warehouse: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "must keep at least the latest version")
    val drop = committedVersions(warehouse).dropRight(keep)
    drop.foreach { v =>
      new java.io.File(s"$warehouse/_log/$v.commit").delete()
      Compact.deleteRecursively(new java.io.File(s"$warehouse/v=$v"))
    }
    drop
  }

  /** Read `table` from the snapshot `version` (or the latest committed
    * one). Fails loudly on an uncommitted/unknown version — an aborted
    * write's orphan directory is not data. `mergeSchema = true` reads
    * the UNION of all data files' schemas (nulls where a file predates
    * a column) — required after an [[appendTableVersioned]] schema
    * evolution, where old files keep their narrow footer; the default
    * single-footer read stays the cheap path for tables whose schema
    * never widened. */
  def readAt(spark: SparkSession, warehouse: String, table: String,
      version: Option[Long] = None, mergeSchema: Boolean = false): DataFrame = {
    val vs = committedVersions(warehouse)
    require(vs.nonEmpty, s"no committed version in $warehouse")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v),
      s"version $v is not committed in $warehouse (committed: ${vs.mkString(", ")})")
    val root = new java.io.File(s"$warehouse/v=$v")
    if (dvDir(root, table).isDirectory) applyDv(spark, root, table, mergeSchema)
    else spark.read.option("mergeSchema", mergeSchema)
      .parquet(new java.io.File(root, table).toString)
  }

  // ---------------------------------------------------------------------------
  // Deletion vectors — row-level DELETE without rewriting data files
  // ---------------------------------------------------------------------------

  /** The sidecar lives BESIDE the table dir (`v=<n>/_dv/<table>/`), not
    * inside it: the snapshot-root `_dv` prefix keeps it out of every
    * table scan and [[Compact.leafDirs]] walk, while the explicit read
    * path `.../_dv/<table>` has a clean basename so the sidecar itself
    * reads as a normal parquet table. */
  private def dvDir(versionRoot: java.io.File, table: String) =
    new java.io.File(versionRoot, s"_dv/$table")

  /** Every physical row of a snapshot table tagged with its position
    * identity: (`_file` = data-file path RELATIVE to the table root —
    * stable across the byte-copy that builds the next version, unlike
    * the absolute `file_path`, and unambiguous across partition leaves,
    * unlike the bare file name — `_pos` = `_metadata.row_index`, the
    * row's physical index within its file). This (file, position) pair
    * is exactly the row address an Iceberg v2 position-delete / Delta
    * deletion vector records. */
  private def withRowId(spark: SparkSession, versionRoot: java.io.File,
      table: String, mergeSchema: Boolean = false): DataFrame =
    spark.read.option("mergeSchema", mergeSchema)
      .parquet(new java.io.File(versionRoot, table).toString).select(col("*"),
      regexp_extract(col("_metadata.file_path"),
        "/v=[0-9]+/" + java.util.regex.Pattern.quote(table) + "/(.*)$", 1).as("_file"),
      col("_metadata.row_index").as("_pos"))

  /** The live rows of a (possibly DV-carrying) table, still carrying
    * their `_file`/`_pos` row addresses: base rows anti-joined against
    * the sidecar on the (file, pos) address — ONE definition shared by
    * the read path ([[applyDv]]) and the delete path ([[deleteWhere]]),
    * so the address-matching semantics cannot drift between them. The
    * sidecar is deletes-sized — tiny next to the table — so the
    * anti-join is HINTED broadcast (a session with auto-broadcast off
    * must not shuffle the base on (_file, _pos)). */
  private def liveWithRowId(spark: SparkSession, versionRoot: java.io.File,
      table: String, mergeSchema: Boolean = false): DataFrame = {
    val base = withRowId(spark, versionRoot, table, mergeSchema)
    if (!dvDir(versionRoot, table).isDirectory) base
    else {
      val dv = spark.read.parquet(dvDir(versionRoot, table).toString)
      base.join(broadcast(dv),
        base("_file") === dv("file") && base("_pos") === dv("pos"), "left_anti")
    }
  }

  private def applyDv(spark: SparkSession, versionRoot: java.io.File,
      table: String, mergeSchema: Boolean = false): DataFrame =
    liveWithRowId(spark, versionRoot, table, mergeSchema).drop("_file", "_pos")

  /** Row-level DELETE via deletion vectors — the Iceberg-v2/Delta-DV
    * write path: rows matching `predicate` are soft-deleted by
    * committing a NEW snapshot version whose data files are BYTE-COPIES
    * of the current ones (spec: md5-identical — never decoded,
    * shuffled, or re-encoded) plus a `_dv/` parquet sidecar of deleted
    * (file, pos) row addresses, merged with any existing sidecar. At
    * 100 TB this is the difference between a GDPR erasure touching
    * kilobytes (the sidecar) and rewriting terabytes; an object-store
    * deployment would reference the base files from a manifest instead
    * of copying them — the same caveat [[compactVersioned]] carries.
    * The predicate is evaluated on the LIVE view, so re-deleting an
    * already-deleted row is a no-op and a repeated call is idempotent
    * in content. Readers through [[readAt]] see the live view (the
    * `_`-prefixed sidecar is invisible to plain parquet readers, which
    * therefore see all physical rows — use the log-resolved path);
    * pinned versions are untouched, and [[compactVersioned]] folds the
    * sidecar into a real rewrite ([[Compact]] would otherwise break
    * the file-relative row addresses). Returns the committed version. */
  def deleteWhere(spark: SparkSession, warehouse: String, table: String,
      predicate: Column): Long = {
    import spark.implicits._
    val cur = latestVersion(warehouse).getOrElse(
      throw new IllegalArgumentException(s"no committed version in $warehouse"))
    val srcRoot = new java.io.File(s"$warehouse/v=$cur")
    require(new java.io.File(srcRoot, table).isDirectory,
      s"table $table is not in v=$cur of $warehouse")
    val oldDv =
      if (dvDir(srcRoot, table).isDirectory)
        spark.read.parquet(dvDir(srcRoot, table).toString)
      else Seq.empty[(String, Long)].toDF("file", "pos")
    val merged = oldDv.union(
      liveWithRowId(spark, srcRoot, table).where(predicate)
        .select(col("_file").as("file"), col("_pos").as("pos")))
    val txn = stageDir(warehouse)
    copyTree(srcRoot, txn)
    // the merged sidecar still READS from the source version's files;
    // the overwrite only replaces the copied sidecar in the staging dir
    merged.coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(txn, s"_dv/$table").toString)
    // staged content derives from v=cur → commit exactly cur+1, or fail
    // if a concurrent writer got there first (lost-update protection)
    publishSnapshotExactly(warehouse, txn, cur + 1)
  }

  private def copyTree(src: java.io.File, dst: java.io.File): Unit =
    if (src.isDirectory) {
      dst.mkdirs()
      Option(src.listFiles()).getOrElse(Array.empty)
        .foreach(c => copyTree(c, new java.io.File(dst, c.getName)))
    } else java.nio.file.Files.copy(src.toPath, dst.toPath)

  /** Commit ONE table's refresh as a new snapshot version — the
    * single-table form of [[writeAllVersioned]] through the same
    * stage → claim → commit protocol, for tables maintained on their
    * own cadence (a materialized summary, a serving index) rather
    * than as part of the full star refresh. `partitionBy` commits a
    * hive-layout (`k=v/`) snapshot; because every snapshot is
    * self-contained, the layout may CHANGE between versions (Iceberg's
    * partition evolution): pinned readers resolve whichever layout
    * their version carries, and partition pruning applies per
    * snapshot — spec-pinned. */
  def writeTableVersioned(df: DataFrame, warehouse: String, table: String,
      partitionBy: Seq[String] = Nil): Long = {
    val txn = stageDir(warehouse)
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(new java.io.File(txn, table).toString)
    publishSnapshot(warehouse, txn)
  }

  /** Constraint-checked snapshot commit — Delta CHECK constraints / DLT
    * expectations over the versioned log: every row is tested against
    * every named constraint (SQL CHECK semantics: a row violates only
    * when the expression evaluates to literal FALSE — NULL/unknown
    * passes, the ANSI rule).
    *  - `failFast = true`: ANY violation aborts BEFORE the claim — no
    *    version is committed and the exception carries per-constraint
    *    counts (the CHECK-constraint contract: bad data never becomes
    *    a resolvable snapshot).
    *  - `failFast = false`: valid rows commit as `table`, violators
    *    land beside them as `<table>_quarantine` carrying a
    *    `_violated` array naming the failed constraints — BOTH inside
    *    ONE atomic snapshot commit (the A18 dead-letter rule at
    *    warehouse grain: malformed rows are routed, never silently
    *    dropped, and readers can never observe accepted rows without
    *    their quarantine ledger).
    * Scale shape: one validation pass (the constraint columns ride the
    * write projection — no second scan); the fail-fast count is a
    * #constraints-row aggregate. Returns the committed version. */
  def writeTableVersionedChecked(df: DataFrame, warehouse: String, table: String,
      constraints: Seq[(String, Column)], failFast: Boolean = true): Long = {
    require(constraints.nonEmpty, "writeTableVersionedChecked needs >= 1 constraint")
    require(!df.columns.contains("_violated"),
      "_violated is reserved for the quarantine ledger")
    val tagged = df.withColumn("_violated",
      array_compact(array(constraints.map { case (n, c) =>
        when(c <=> lit(false), lit(n)) }: _*)))
    if (failFast) {
      // persist so the rows the validation saw are EXACTLY the rows the
      // commit writes: recomputing `df` for the write would let a
      // non-deterministic source pass validation yet commit violating
      // rows (r10 advice — the 'bad data never becomes a resolvable
      // snapshot' contract holds against rand()/concurrent inputs too)
      val persisted = tagged.persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val counts = persisted.select(explode(col("_violated")).as("c"))
          .groupBy("c").count().collect()
          .map(r => s"${r.getString(0)}=${r.getLong(1)}")
        if (counts.nonEmpty)
          throw new IllegalStateException(
            s"constraint violations in $table, nothing committed: " +
              counts.sorted.mkString(", "))
        writeTableVersioned(persisted.drop("_violated"), warehouse, table)
      } finally persisted.unpersist()
    } else {
      val txn = stageDir(warehouse)
      val persisted = tagged.persist(StorageLevel.MEMORY_AND_DISK)
      persisted.where(size(col("_violated")) === 0).drop("_violated")
        .write.mode("overwrite").parquet(new java.io.File(txn, table).toString)
      persisted.where(size(col("_violated")) > 0)
        .write.mode("overwrite")
        .parquet(new java.io.File(txn, s"${table}_quarantine").toString)
      persisted.unpersist()
      publishSnapshot(warehouse, txn)
    }
  }

  /** [[writeTableVersioned]] for content DERIVED from version `from` (a
    * CDC apply, any read-modify-write): commits exactly `from + 1`, or
    * throws ConcurrentModificationException if a concurrent writer
    * committed first — the staged derivation would silently erase that
    * commit if it claimed the next free number instead. */
  def writeTableVersionedFrom(df: DataFrame, warehouse: String, table: String,
      from: Long): Long = {
    val txn = stageDir(warehouse)
    df.write.mode("overwrite").parquet(new java.io.File(txn, table).toString)
    publishSnapshotExactly(warehouse, txn, from + 1)
  }

  /** Append `df`'s rows to `table` as a new snapshot derived from
    * version `from`: the prior snapshot is byte-copied (base data files
    * never rewritten — the [[deleteWhere]]/[[appendTableVersionedStats]]
    * stance) and `df` lands as ADDITIONAL files in the table directory,
    * committed as exactly `from + 1` (lost-update protection, like every
    * read-modify-write writer). `df`'s schema may be a SUPERSET of the
    * table's — schema evolution by append, the Delta `mergeSchema`
    * write: old files keep their narrow footer untouched, new files
    * carry the added columns, and a merged read ([[readAt]] with
    * `mergeSchema = true`) surfaces the union with nulls where a file
    * predates a column. Existing columns must keep their exact type —
    * dropping or retyping a column is a REWRITE, not an append, and is
    * rejected here (silent type widening would poison every merged
    * read downstream). At 100 TB this is the only affordable way to
    * add a derived column going forward: terabytes of history stay
    * byte-identical, the new column exists only where new data carries
    * it, and a backfill is an explicit separate rewrite. */
  def appendTableVersioned(df: DataFrame, warehouse: String, table: String,
      from: Long): Long = {
    // the orphan rule readAt enforces holds for writers too: deriving a
    // snapshot from a claimed-but-uncommitted v-dir would publish a
    // crashed writer's half-write as committed data
    require(committedVersions(warehouse).contains(from),
      s"version $from is not committed in $warehouse — refusing to derive " +
        "a snapshot from an uncommitted/orphan directory")
    val srcRoot = new java.io.File(s"$warehouse/v=$from")
    require(new java.io.File(srcRoot, table).isDirectory,
      s"table $table is not in v=$from of $warehouse")
    // a data-skipping sidecar byte-copied across this append would NOT
    // cover the new files — pruned reads at from+1 would silently drop
    // every appended row (the DataSkipping 'refuse instead' rule). The
    // stats path with manifest maintenance is appendTableVersionedStats;
    // a bloom sidecar grows through appendBloom on that same path.
    Seq("stats", "bloom").foreach { kind =>
      require(!new java.io.File(srcRoot, s"$table/_idx/$kind").isDirectory,
        s"table $table carries an _idx/$kind sidecar in v=$from: a plain " +
          "append would leave it stale (appended files invisible to pruned " +
          "reads) — use appendTableVersionedStats, which grows the manifest")
    }
    // a hive-partitioned (`k=v/`) snapshot cannot take a flat file
    // drop-in: appended files at the table root break Spark's partition
    // discovery ("conflicting directory structures") and the partition
    // column's inferred type need not match the frame's — a committed
    // snapshot would be unreadable. Refuse with the remedy.
    require(!Option(new java.io.File(srcRoot, table).listFiles())
      .getOrElse(Array.empty)
      .exists(f => f.isDirectory && f.getName.contains("=")),
      s"table $table in v=$from has a hive-partitioned layout: a flat append " +
        "would break partition discovery — commit a fresh snapshot via " +
        "writeTableVersioned with the same partitionBy instead")
    // merged read: after a prior evolution the table's files carry mixed
    // footers, and the superset check must hold against their UNION
    val existing = df.sparkSession.read.option("mergeSchema", true)
      .parquet(new java.io.File(srcRoot, table).toString).schema
    val incoming = df.schema.map(f => f.name -> f.dataType).toMap
    val broken = existing.filterNot(f => incoming.get(f.name).contains(f.dataType))
    require(broken.isEmpty,
      s"appendTableVersioned to $table: incoming schema must be a superset " +
        s"with identical types; missing/retyped: ${broken.map(_.name).mkString(", ")}")
    val txn = stageDir(warehouse)
    copyTree(srcRoot, txn)
    df.write.mode("append").parquet(new java.io.File(txn, table).toString)
    publishSnapshotExactly(warehouse, txn, from + 1)
  }

  /** [[writeTableVersioned]] with a clustered layout and a committed
    * `_stats` data-skipping manifest — the "stats in the log" shape: the
    * table is range-partitioned + sorted on `sortBy` (so file min/max
    * intervals on those columns are tight and disjoint), the per-file
    * manifest is written INSIDE the staging dir, and both become visible
    * in one commit — a reader never sees data without its stats or
    * stats for files that aren't there. blockSize/check-interval pins
    * follow [[writeFactClustered]] (deterministic row groups). */
  def writeTableVersionedStats(df: DataFrame, warehouse: String, table: String,
      sortBy: Seq[String], statsCols: Seq[String],
      blockSize: Int = 128 * 1024 * 1024): Long = {
    require(sortBy.nonEmpty, "writeTableVersionedStats needs a clustering key")
    val txn = stageDir(warehouse)
    val tableDir = new java.io.File(txn, table).toString
    df.repartitionByRange(4, sortBy.map(col): _*)
      .sortWithinPartitions(sortBy.map(col): _*)
      .write.mode("overwrite")
      .option("parquet.block.size", blockSize.toString)
      // deterministic flush points — see writeFactClustered
      .option("parquet.block.size.row.check.min", "100")
      .option("parquet.block.size.row.check.max", "100")
      .parquet(tableDir)
    DataSkipping.writeStats(df.sparkSession, tableDir, statsCols)
    publishSnapshot(warehouse, txn)
  }

  /** Incremental commit to a stats-carrying table — the versioned-path
    * consumer of [[DataSkipping.appendStats]]: the new snapshot's data
    * files are BYTE-COPIES of the current ones plus freshly written
    * files for `df`, and the `_idx/stats` manifest grows by exactly the
    * new files' rows; copied data files AND copied manifest parts stay
    * byte-identical (DataSkippingSpec pins both). Nightly ingest
    * therefore pays O(new data) for the table and its skipping sidecar
    * alike — a full [[writeTableVersionedStats]] recommit would rescan
    * the table for stats it already has. Same stage → claim-exactly
    * protocol as [[deleteWhere]] (a read-modify-write: commits exactly
    * cur + 1 or throws ConcurrentModificationException). The appended
    * files are clustered on `sortBy` among THEMSELVES; base-file
    * intervals are untouched, so interval pruning stays a superset
    * guarantee (and tightens again at the next [[compactVersioned]]). */
  def appendTableVersionedStats(df: DataFrame, warehouse: String, table: String,
      sortBy: Seq[String], statsCols: Seq[String],
      blockSize: Int = 128 * 1024 * 1024): Long = {
    require(sortBy.nonEmpty, "appendTableVersionedStats needs a clustering key")
    val cur = latestVersion(warehouse).getOrElse(
      throw new IllegalArgumentException(s"no committed version in $warehouse"))
    val srcRoot = new java.io.File(s"$warehouse/v=$cur")
    require(new java.io.File(srcRoot, table).isDirectory,
      s"table $table is not in v=$cur of $warehouse")
    val txn = stageDir(warehouse)
    copyTree(srcRoot, txn)
    val tableDir = new java.io.File(txn, table).toString
    df.repartitionByRange(4, sortBy.map(col): _*)
      .sortWithinPartitions(sortBy.map(col): _*)
      .write.mode("append")
      .option("parquet.block.size", blockSize.toString)
      .option("parquet.block.size.row.check.min", "100")
      .option("parquet.block.size.row.check.max", "100")
      .parquet(tableDir)
    DataSkipping.appendStats(df.sparkSession, tableDir, statsCols)
    publishSnapshotExactly(warehouse, txn, cur + 1)
  }

  /** Manifest-pruned interval scan of a committed snapshot table: the
    * version resolves through the log ([[readAt]]'s rule), then the
    * `_stats` manifest — not a directory listing, not parquet footers —
    * decides which files the scan opens ([[DataSkipping.prunedScan]]).
    * The caller still applies the exact predicate (file pruning is a
    * superset guarantee, like partition pruning). DV-carrying tables
    * refuse: a pruned scan that skipped the sidecar's files would
    * resurrect deleted rows. */
  def readAtPruned(spark: SparkSession, warehouse: String, table: String,
      c: String, lo: Any, hi: Any, version: Option[Long] = None): DataFrame = {
    val vs = committedVersions(warehouse)
    require(vs.nonEmpty, s"no committed version in $warehouse")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v),
      s"version $v is not committed in $warehouse (committed: ${vs.mkString(", ")})")
    val root = new java.io.File(s"$warehouse/v=$v")
    require(!dvDir(root, table).isDirectory,
      s"readAtPruned: $table carries a deletion vector at v=$v — " +
        "compactVersioned materializes it; pruned scans don't apply DVs")
    DataSkipping.prunedScan(spark, new java.io.File(root, table).toString, c, lo, hi)
  }

  /** q131: stats-manifest file skipping inside the correctness gate —
    * the fact is committed clustered on `student` with its `_stats`
    * manifest ([[writeTableVersionedStats]]), then a ~5% student band
    * (min + (max−min)/20, integer arithmetic both engines truncate
    * identically for these positive keys) is served THROUGH
    * [[readAtPruned]]: the manifest decides which files open, the exact
    * predicate filters within them, and the per-student rollup must
    * hash-equal the oracle's plain filtered aggregate — a manifest that
    * drops a boundary file loses rows and fails the gate; one that
    * keeps everything still passes but the spec's file-count assertion
    * catches it (correctness and skipping pinned by different tests,
    * deliberately). */
  val q131_stats_prune: Q = (s, d) => {
    val wh = scratchDir(s, d, "statswh")
    val f = Star.fact(s, d)
    // the committed table + manifest are session-invariant: built once,
    // reps serve the pruned read (r10 — recommitting an identical
    // snapshot per rep was pure write I/O); keep = 1 bounds the store
    graft.BuildPhase.timed {
      graft.SessionMemo.once(s, d, "stats:wh") {
        writeTableVersionedStats(f, wh, "fact_by_student",
          sortBy = Seq("student"), statsCols = Seq("student"),
          blockSize = 64 * 1024)
        vacuumVersions(wh, keep = 1)
      }
    }
    val r = f.agg(min("student"), max("student")).head()
    val lo = r.getLong(0)
    val hi = lo + (r.getLong(1) - lo) / 20
    readAtPruned(s, wh, "fact_by_student", "student", lo, hi)
      .where(col("student").between(lo, hi))
      .groupBy("student")
      .agg(count(lit(1)).as("n_rows"), sum("sks").as("total_sks"))
      .orderBy("student")
  }

  /** q139: the INCREMENTAL stats-manifest path inside the correctness
    * gate — q131 proves the full-rebuild manifest serves correct rows;
    * this proves the append-maintained one does. The fact's lower
    * student half commits with its manifest
    * ([[writeTableVersionedStats]]), the upper half arrives as an
    * incremental commit ([[appendTableVersionedStats]] — base files
    * byte-copied, manifest grown by the new files' rows only), and a
    * band STRADDLING the append boundary is served through
    * [[readAtPruned]]: rows must come from base-manifest files AND
    * appended-manifest rows alike, so a manifest that lost either side
    * (or an append that perturbed base rows) fails the hash against
    * the oracle's plain filtered aggregate. */
  val q139_stats_append: Q = (s, d) => {
    val wh = scratchDir(s, d, "statsapp")
    val f = Star.fact(s, d)
    val r = f.agg(min("student"), max("student")).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val mid = lo + (hi - lo) / 2
    // base commit + incremental append are session-invariant: built
    // once, reps serve the boundary-band read. NO vacuum here — the
    // append-grown v2 must stay the resolvable latest.
    graft.BuildPhase.timed {
      graft.SessionMemo.once(s, d, "stats:whApp") {
        writeTableVersionedStats(f.where(col("student") <= mid), wh,
          "fact_by_student", sortBy = Seq("student"), statsCols = Seq("student"),
          blockSize = 64 * 1024)
        appendTableVersionedStats(f.where(col("student") > mid), wh,
          "fact_by_student", sortBy = Seq("student"), statsCols = Seq("student"),
          blockSize = 64 * 1024)
      }
    }
    val (blo, bhi) = (mid - (hi - lo) / 40, mid + (hi - lo) / 40)
    readAtPruned(s, wh, "fact_by_student", "student", blo, bhi)
      .where(col("student").between(blo, bhi))
      .groupBy("student")
      .agg(count(lit(1)).as("n_rows"), sum("sks").as("total_sks"))
      .orderBy("student")
  }

  /** q149: SCHEMA EVOLUTION through the versioned log — the
    * add-a-column lifecycle every long-lived table eventually needs:
    * v1 commits the lower-student-half summary under the ORIGINAL
    * 3-column schema; v2 arrives via [[appendTableVersioned]] carrying
    * the upper half WITH a new `gpa` column (v1's files byte-copied,
    * never rewritten — the spec pins md5 identity); the gate reads
    * latest with `mergeSchema = true` and must see the union schema
    * with `gpa` null exactly on pre-evolution rows. The oracle
    * recomputes the same frame from the fact table with a CASE-null on
    * the old half, so a read that lost the appended files, perturbed a
    * base row, or backfilled where it shouldn't fails the hash. Build
    * is session-invariant (memoized); reps pay the merged read. */
  val q149_schema_evolution: Q = (s, d) => {
    val wh = scratchDir(s, d, "evolve")
    val f = Star.fact(s, d)
    val r = f.agg(min("student"), max("student")).head()
    val mid = r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 2
    graft.BuildPhase.timed {
      graft.SessionMemo.once(s, d, "evolve:wh") {
        val v1 = writeTableVersioned(
          f.where(col("student") <= mid).groupBy("student")
            .agg(count(lit(1)).as("n_rows"), sum("sks").as("total_sks")),
          wh, "student_summary")
        appendTableVersioned(
          f.where(col("student") > mid).groupBy("student")
            .agg(count(lit(1)).as("n_rows"), sum("sks").as("total_sks"),
              Star.round2(sum(col("sks") * col("bobot")) / sum(col("sks"))).as("gpa")),
          wh, "student_summary", from = v1)
        ()
      }
    }
    readAt(s, wh, "student_summary", mergeSchema = true)
      .select("student", "n_rows", "total_sks", "gpa")
      .orderBy("student")
  }

  /** q153: q150's MERGE run THROUGH the version log — the transactional
    * composition a warehouse user actually executes: the base summary
    * commits as a snapshot, the merge result commits as EXACTLY
    * base+1 ([[writeTableVersionedFrom]] — a concurrent commit between
    * the read and the write must fail the claim, not be silently
    * erased), and the gate reads the merged table back via [[readAt]],
    * never from the in-memory frame. The oracle is q150's VERBATIM:
    * surviving the round trip through stage → claim → commit → resolve
    * without changing a row is the point. Reps keep cycling version
    * pairs; vacuum bounds the scratch store (the q119 convention). */
  val q153_merge_versioned: Q = (s, d) => {
    val wh = scratchDir(s, d, "merge_log")
    val f = Star.fact(s, d)
    val maxY = f.agg(max("tahun")).head().getLong(0)
    val base = studentSummary(f.where(col("tahun") < maxY &&
      graft.ops.TextCore.idBucket(col("student")) < 90))
    val src = studentSummary(f.where(col("tahun") === maxY))
    val vm = graft.BuildPhase.timed {
      val vb = writeTableVersioned(base, wh, "student_summary")
      val v = writeTableVersionedFrom(
        mergeInto(readAt(s, wh, "student_summary", Some(vb)), src,
          Seq("student"), deleteWhen = Some(col("total_sks") < 60)),
        wh, "student_summary", from = vb)
      vacuumVersions(wh, keep = 2) // keeps (vb, vm) — the newest pair
      v
    }
    readAt(s, wh, "student_summary", Some(vm)).orderBy("student")
  }

  /** q159: CONSTRAINT-CHECKED commit inside the correctness gate — the
    * quarantine arm of [[writeTableVersionedChecked]] on real data: the
    * fact commits under two expectations ('positive_sks': sks > 0 —
    * satisfied corpus-wide; 'known_grade': bobot > 0 — the RO grade
    * rows violate), and the gate reads BOTH tables back through the
    * version log: accepted count, quarantined count, and per-constraint
    * violation counts served from the quarantine ledger's `_violated`
    * arrays. The oracle restates the expectations as conditional
    * aggregates over the raw fact, so a routing error on either side of
    * the split — or a ledger that lost a constraint name — fails the
    * hash. Build is session-invariant (memoized commit); reps pay the
    * two log-resolved reads. */
  val q159_checked_commit: Q = (s, d) => {
    import s.implicits._
    val wh = scratchDir(s, d, "checked")
    graft.BuildPhase.timed {
      graft.SessionMemo.once(s, d, "checked:wh") {
        writeTableVersionedChecked(Star.fact(s, d), wh, "fact",
          constraints = Seq(
            "positive_sks" -> (col("sks") > 0),
            "known_grade" -> (col("bobot") > 0)),
          failFast = false)
        ()
      }
    }
    val accepted = readAt(s, wh, "fact")
      .agg(count(lit(1)).as("n_rows"))
      .select(lit("accepted").as("name"), col("n_rows"))
    val quarantine = readAt(s, wh, "fact_quarantine")
    val quarantined = quarantine.agg(count(lit(1)).as("n_rows"))
      .select(lit("quarantined").as("name"), col("n_rows"))
    val perConstraint = quarantine
      .select(explode(col("_violated")).as("c"))
      .groupBy("c").agg(count(lit(1)).as("n_rows"))
      .select(concat(lit("viol_"), col("c")).as("name"), col("n_rows"))
    accepted.unionByName(quarantined).unionByName(perConstraint)
      .orderBy("name")
  }

  /** q150: MERGE INTO over the student summary — all four branches of
    * [[mergeInto]] live on real data: base = pre-latest-year summaries
    * of students in id-hash buckets < 90 (so ~10% of the population is
    * absent from the base and must INSERT), source = the latest year's
    * summaries (matched students UPDATE to the source row), and
    * matched source rows under 60 total SKS DELETE (the
    * WHEN MATCHED AND cond THEN DELETE clause; unmatched small rows
    * still insert — the ANSI rule the oracle pins). Students with no
    * latest-year activity pass through untouched. The oracle restates
    * the full-outer classification directly, so any branch leaking
    * into another fails the hash. */
  val q150_merge_upsert: Q = (s, d) => {
    val f = Star.fact(s, d)
    val maxY = f.agg(max("tahun")).head().getLong(0)
    val base = studentSummary(f.where(col("tahun") < maxY &&
      graft.ops.TextCore.idBucket(col("student")) < 90))
    val src = studentSummary(f.where(col("tahun") === maxY))
    mergeInto(base, src, Seq("student"),
      deleteWhen = Some(col("total_sks") < 60))
      .orderBy("student")
  }

  /** Row-level diff of two frames sharing a key — the change-data-feed
    * primitive (Delta CDF's insert/delete/update_preimage+postimage,
    * collapsed to one row per changed key with `old_*`/`new_*` columns):
    *   - key only in `neu`            → 'insert'
    *   - key only in `old`            → 'delete'
    *   - key in both, any value col differing (null-safe) → 'update'
    *   - key in both, all value cols equal → NO row (unchanged keys are
    *     the overwhelming majority of a refresh; emitting them would make
    *     the feed as big as the table).
    * Value columns are the UNION of both sides' non-key columns; a column
    * absent on one side reads as null there (schema evolution: an added
    * column surfaces as updates only where its value is non-null, and the
    * diff never crashes on a schema change between versions).
    *
    * Scale shape: ONE full-outer shuffle join on the key — both sides
    * hash-partition on `keys`, nothing is collected; at cluster scale the
    * two snapshot scans prune to the key+changed columns
    * (`ReadSchema`), and a warehouse bucketed on the key makes the join
    * shuffle-free. Presence is tracked with literal marker columns, not
    * key-null checks, so all-null value rows and null-typed columns
    * classify correctly. */
  def tableDiff(old: DataFrame, neu: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "tableDiff needs at least one key column")
    Seq(("old", old), ("new", neu)).foreach { case (side, df) =>
      require(keys.forall(df.columns.contains),
        s"tableDiff: $side side is missing key columns " +
          s"(${keys.filterNot(df.columns.contains).mkString(", ")})")
    }
    val vals = (old.columns ++ neu.columns).distinct.filterNot(keys.contains).toSeq
    val allTypes = (old.schema ++ neu.schema).map(f => f.name -> f.dataType).toMap
    def side(df: DataFrame, tag: String): DataFrame = {
      val has = df.columns.toSet
      val aligned = vals.map { c =>
        // absent on this side → a TYPED null (the other side's type), so
        // the feed itself stays writable to parquet (void columns aren't)
        (if (has(c)) col(c) else lit(null).cast(allTypes(c))).as(s"${tag}_$c")
      }
      df.select((keys.map(col) ++ aligned :+ lit(true).as(s"_${tag}_present")): _*)
    }
    val joined = side(old, "old").join(side(neu, "new"), keys, "full_outer")
    val changed = vals.map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined
      .withColumn("change_type",
        when(col("_new_present").isNull, "delete")
          .when(col("_old_present").isNull, "insert")
          .otherwise("update"))
      .where(col("change_type") =!= "update" || changed)
      .drop("_old_present", "_new_present")
  }

  /** [[tableDiff]] between two committed snapshot versions, resolved
    * strictly through the version log ([[readAt]]) — the time-travel
    * store's CDC read path: "what changed between v_from and v_to". */
  def snapshotDiff(spark: SparkSession, warehouse: String, table: String,
      fromV: Long, toV: Long, keys: Seq[String]): DataFrame =
    tableDiff(
      readAt(spark, warehouse, table, Some(fromV)),
      readAt(spark, warehouse, table, Some(toV)), keys)

  /** Apply a [[tableDiff]] change feed to a base snapshot — the MERGE /
    * incremental-view-maintenance half of CDC. Contract (spec-pinned as a
    * ScalaCheck round trip): for key-unique frames,
    * `applyChanges(old, tableDiff(old, neu, keys), keys) ≡ neu`.
    * Deletes and update pre-images leave via ONE anti-join on the feed's
    * keys; insert/update post-images (`new_*`) union in. Columns are the
    * union of base and feed value columns, absent-side nulls — the same
    * schema-evolution stance as [[tableDiff]], so replaying a feed whose
    * snapshot added a column widens the base instead of crashing.
    *
    * Scale shape: the feed is the CHANGED rows only — tiny next to the
    * base in a steady-state refresh — so the anti-join broadcasts and the
    * base never shuffles; this is the whole point of consuming the feed
    * instead of re-reading the new snapshot (at 100 TB the base table
    * stays in place, only deltas move). */
  def applyChanges(base: DataFrame, feed: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.forall(base.columns.contains) && keys.forall(feed.columns.contains),
      s"applyChanges: both sides need key columns (${keys.mkString(", ")})")
    require(feed.columns.contains("change_type"),
      "applyChanges: feed must be a tableDiff output (missing change_type)")
    // key columns are NOT prefix-scanned: a key literally named "new_x"
    // must not conjure a phantom value column "x"
    val feedVals = feed.columns.filterNot(keys.contains)
      .collect { case c if c.startsWith("new_") => c.drop(4) }.toSeq
    val vals = (base.columns.filterNot(keys.contains) ++ feedVals).distinct.toSeq
    val types = (base.schema.map(f => f.name -> f.dataType) ++
      feed.schema.map(f => f.name.stripPrefix("new_") -> f.dataType)).toMap
    def aligned(df: DataFrame, has: String => Boolean, read: String => Column) =
      df.select(keys.map(col) ++ vals.map(c =>
        (if (has(c)) read(c) else lit(null).cast(types(c))).as(c)): _*)
    val kept = aligned(base, base.columns.contains, col)
      .join(feed.select(keys.map(col): _*), keys, "left_anti")
    val upserts = aligned(feed.where(col("change_type") =!= "delete"),
      c => feedVals.contains(c), c => col(s"new_$c"))
    kept.unionByName(upserts)
  }

  /** MERGE INTO — the general upsert over key-matched frames (Delta /
    * Iceberg / ANSI MERGE collapsed to its data-pipeline core):
    *   - key in both        → source values (WHEN MATCHED UPDATE),
    *     unless `deleteWhen` holds on the SOURCE row → row dropped
    *     (WHEN MATCHED AND cond THEN DELETE),
    *   - key only in source → inserted (WHEN NOT MATCHED INSERT — the
    *     delete clause never applies to unmatched rows, the ANSI rule),
    *   - key only in base   → kept untouched.
    * Columns are the union of both sides' value columns with typed
    * nulls for an absent side — the [[tableDiff]]/[[applyChanges]]
    * schema-evolution stance; a column the SOURCE lacks keeps its base
    * value on matched rows (Delta's `UPDATE SET *` rule — the update
    * writes the columns the source carries, not nulls over the rest).
    * `deleteWhen` is evaluated against the source row BEFORE the join,
    * so it can only reference source columns; matched-row conditions
    * over base columns belong to a diff-then-apply flow (q119/q120).
    * Duplicate source keys RAISE at runtime — the ANSI cardinality
    * violation for matched rows, extended to unmatched ones (two
    * inserts under one key would break the target's key uniqueness
    * just as silently). The check is a window on the join's own keys —
    * co-partitioned with the join exchange, no extra pass.
    *
    * Scale shape: ONE full-outer shuffle join on the keys — the
    * irreducible MERGE wire cost when the source is itself table-sized
    * (a reprocessed partition, a backfill). A steady-state flow with a
    * delta-sized source should take [[tableDiff]]→[[applyChanges]]
    * instead: there the base never shuffles and the feed broadcasts. */
  def mergeInto(base: DataFrame, source: DataFrame, keys: Seq[String],
      deleteWhen: Option[Column] = None): DataFrame = {
    Seq(("base", base), ("source", source)).foreach { case (side, df) =>
      require(keys.forall(df.columns.contains),
        s"mergeInto: $side side is missing key columns " +
          s"(${keys.filterNot(df.columns.contains).mkString(", ")})")
    }
    val vals = (base.columns ++ source.columns).distinct.filterNot(keys.contains).toSeq
    val types = (base.schema ++ source.schema).map(f => f.name -> f.dataType).toMap
    def side(df: DataFrame, tag: String, extra: Seq[Column]): DataFrame =
      df.select(keys.map(col) ++ vals.map(c =>
        (if (df.columns.contains(c)) col(c) else lit(null).cast(types(c)))
          .as(s"${tag}_$c")) ++ extra: _*)
    val b = side(base, "b", Seq(lit(true).as("_b_present")))
    val sr = side(
      source
        .withColumn("_merge_del",
          coalesce(deleteWhen.getOrElse(lit(false)), lit(false)))
        .withColumn("_merge_dup",
          count(lit(1)).over(Window.partitionBy(keys.map(col): _*))),
      "s", Seq(lit(true).as("_s_present"), col("_merge_del"), col("_merge_dup")))
    val srcHas = source.columns.toSet
    // the dup guard lives INSIDE the filter predicate so it is evaluated
    // for every joined row (a free-standing projected column would be
    // pruned away unused); base-only rows carry a null count → otherwise
    b.join(sr, keys, "full_outer")
      .where(
        when(col("_merge_dup") > 1L,
          raise_error(concat(lit("mergeInto: duplicate source rows for key ("),
            concat_ws(", ", keys.map(col(_).cast("string")): _*), lit(")")))
            .cast("boolean"))
        .otherwise(!(col("_b_present").isNotNull && col("_s_present").isNotNull &&
          col("_merge_del"))))
      .select(keys.map(col) ++ vals.map { c =>
        (if (srcHas(c))
          when(col("_s_present").isNotNull, col(s"s_$c")).otherwise(col(s"b_$c"))
        else col(s"b_$c")).as(c)
      }: _*)
  }

  /** The per-student summary under CDC in q119: mergeable partials
    * (count, Σsks) plus the round2'd GPA ratio — every value
    * deterministic cross-engine (sks·bobot are exact multiples of 0.5,
    * so the sums are exact and the one division is the only rounding
    * site, Star.round2's contract). */
  private def studentSummary(fact: DataFrame): DataFrame =
    fact.groupBy("student").agg(
      count(lit(1)).as("n_rows"),
      sum("sks").as("total_sks"),
      Star.round2(sum(col("sks") * col("bobot")) / sum(col("sks"))).as("gpa"))

  /** q119: snapshot diff / change-data-feed over the versioned
    * warehouse. A sliding-window refresh of the student summary — v_old
    * covers years [min, max) (last cycle's window), v_new covers
    * (min, max] (the window slid by one year: oldest year retired,
    * newest arrived) — is committed as two snapshot versions of one
    * table, then [[snapshotDiff]] reads both THROUGH the version log
    * and emits the change feed: students active only in the retired
    * year DELETE, students first active in the new year INSERT, and
    * students whose window contents shifted UPDATE with old/new values
    * side by side. Unchanged students (all activity strictly inside
    * both windows) produce no row — the CDC contract the oracle pins.
    * Reps keep committing fresh version pairs; the vacuum keeps the
    * newest pair so the scratch store stays bounded. */
  val q119_snapshot_diff: Q = (s, d) => {
    val wh = scratchDir(s, d, "cdc")
    val f = Star.fact(s, d)
    val yr = f.agg(min("tahun"), max("tahun")).head()
    val (minY, maxY) = (yr.getLong(0), yr.getLong(1))
    val (v1, v2) = graft.BuildPhase.timed {
      val a = writeTableVersioned(
        studentSummary(f.where(col("tahun") < maxY)), wh, "student_summary")
      val b = writeTableVersioned(
        studentSummary(f.where(col("tahun") > minY)), wh, "student_summary")
      (a, b)
    }
    val feed = snapshotDiff(s, wh, "student_summary", v1, v2, Seq("student"))
      .orderBy("student")
    graft.BuildPhase.timed(vacuumVersions(wh, keep = 2))
    feed
  }

  /** q120: CDC APPLY — the consuming half of q119's feed. The v1
    * summary (read back through the version log) plus the v1→v2 change
    * feed must reconstruct the v2 summary EXACTLY — deletes drop their
    * students, inserts add theirs, updates swap in the post-image, and
    * every student the feed is silent about passes through untouched.
    * The oracle computes v2 directly from the fact table, so the gate
    * hashes "base + feed" against "recompute from scratch" — the
    * incremental-view-maintenance equivalence, proved cross-engine on
    * real data rather than asserted. */
  val q120_cdc_apply: Q = (s, d) => {
    val wh = scratchDir(s, d, "cdc_apply")
    val f = Star.fact(s, d)
    val yr = f.agg(min("tahun"), max("tahun")).head()
    val (minY, maxY) = (yr.getLong(0), yr.getLong(1))
    val (v1, v2) = graft.BuildPhase.timed {
      val a = writeTableVersioned(
        studentSummary(f.where(col("tahun") < maxY)), wh, "student_summary")
      val b = writeTableVersioned(
        studentSummary(f.where(col("tahun") > minY)), wh, "student_summary")
      (a, b)
    }
    val feed = snapshotDiff(s, wh, "student_summary", v1, v2, Seq("student"))
    val applied = applyChanges(
      readAt(s, wh, "student_summary", Some(v1)), feed, Seq("student"))
      .orderBy("student")
    graft.BuildPhase.timed(vacuumVersions(wh, keep = 2))
    applied
  }

  /** q130: CDC CHAIN replay — the multi-hop consumer loop q120's single
    * hop doesn't prove: three growing ingest windows commit as three
    * snapshot versions, and a consumer pinned at v1 applies feed(v1→v2)
    * then feed(v2→v3) — the nightly incremental consumer that was down
    * for a cycle and catches up feed by feed. The result must
    * hash-equal the NEWEST snapshot recomputed from scratch by the
    * oracle: the diff/apply round trip composes across commits, proved
    * cross-engine on real data. Each feed moves only that hop's delta —
    * the consumer never re-reads a snapshot after its base pin. */
  val q130_cdc_chain: Q = (s, d) => {
    val wh = scratchDir(s, d, "cdc_chain")
    val f = Star.fact(s, d)
    val maxY = f.agg(max("tahun")).head().getLong(0)
    val (v1, v2, v3) = graft.BuildPhase.timed {
      val a = writeTableVersioned(
        studentSummary(f.where(col("tahun") < maxY - 1)), wh, "student_summary")
      val b = writeTableVersioned(
        studentSummary(f.where(col("tahun") < maxY)), wh, "student_summary")
      val c = writeTableVersioned(studentSummary(f), wh, "student_summary")
      (a, b, c)
    }
    val caught = applyChanges(
      applyChanges(
        readAt(s, wh, "student_summary", Some(v1)),
        snapshotDiff(s, wh, "student_summary", v1, v2, Seq("student")), Seq("student")),
      snapshotDiff(s, wh, "student_summary", v2, v3, Seq("student")), Seq("student"))
      .orderBy("student")
    graft.BuildPhase.timed(vacuumVersions(wh, keep = 3))
    caught
  }

  /** [[studentSummary]] carrying its MERGEABLE partials (Σ sks·bobot
    * alongside count and Σ sks) — the self-maintainable form an
    * incrementally-maintained aggregate view needs: the ratio gpa can't
    * absorb a delta, but its numerator and denominator can, and every
    * partial is exact (sks integral, bobot a 0.5 multiple — sums are
    * exact doubles in any order), so the one rounding site stays the
    * final division, recomputed from merged partials. */
  private def studentSummaryM(fact: DataFrame): DataFrame =
    fact.groupBy("student").agg(
      count(lit(1)).as("n_rows"),
      sum("sks").as("total_sks"),
      sum(col("sks") * col("bobot")).as("total_w"))
      .withColumn("gpa", Star.round2(col("total_w") / col("total_sks")))

  /** Incremental maintenance of the [[studentSummaryM]] aggregate view
    * from FACT-level deltas — true incremental view maintenance, one
    * rung past [[applyChanges]]: that consumes a feed of the view's OWN
    * rows (someone already recomputed each changed group); this
    * consumes raw fact insertions/deletions and folds them into the
    * group partials directly, so no group is ever recomputed from base
    * facts. Standard delta-aggregation (Gupta & Mumick's IVM for
    * SUM/COUNT views): each delta fact contributes ±1/±sks/±(sks·bobot)
    * to its group; groups whose count reaches zero leave the view;
    * groups the delta never touches pass through UNTOUCHED — at 100 TB
    * the base view never shuffles (anti/semi joins on the broadcast
    * delta key set) and only delta-keyed groups are rebuilt, each from
    * its old partials plus the delta sums, never from the fact table.
    *
    * Exactness (the gate's proof obligation): partials are exact
    * doubles (see [[studentSummaryM]]), so old + delta ≡ recompute from
    * scratch BIT-identically, and the maintained view hash-equals the
    * oracle's full recompute — PropertiesSpec pins the same equivalence
    * on ScalaCheck-random fact splits. Caller contract: `removed` rows
    * must actually exist in the view's base (removing an absent fact
    * would drive partials negative — there is nothing to validate them
    * against without the base facts, which is the point of not having
    * them). */
  def maintainStudentSummary(base: DataFrame, removed: DataFrame,
      added: DataFrame): DataFrame = {
    def deltas(df: DataFrame, sign: Int): DataFrame =
      df.select(col("student"), lit(sign.toLong).as("sign"), col("sks"),
        (col("sks") * col("bobot")).as("w"))
    val d = deltas(added, 1).unionByName(deltas(removed, -1))
      .groupBy("student")
      .agg(sum(col("sign")).as("dn"),
        sum(col("sign").cast("double") * col("sks")).as("dsks"),
        sum(col("sign").cast("double") * col("w")).as("dw"))
    val dKeys = d.select("student")
    val untouched = base.join(broadcast(dKeys), Seq("student"), "left_anti")
    // both sides of the merge are delta-sized: the view contributes
    // only its touched groups (broadcast semi), the delta its sums
    val touched = base.join(broadcast(dKeys), Seq("student"), "left_semi")
    val merged = d.join(touched, Seq("student"), "left")
      .select(col("student"),
        (coalesce(col("n_rows"), lit(0L)) + col("dn")).as("n_rows"),
        (coalesce(col("total_sks"), lit(0.0)) + col("dsks")).as("total_sks"),
        (coalesce(col("total_w"), lit(0.0)) + col("dw")).as("total_w"))
      .where(col("n_rows") > 0)
      .withColumn("gpa", Star.round2(col("total_w") / col("total_sks")))
    untouched.unionByName(merged)
  }

  /** q132: incremental view maintenance from fact-level deltas, gated
    * against the from-scratch recompute. The summary view is built on
    * last cycle's window [min, max); the window slides by one year —
    * the retired year's facts are the DELETIONS, the arriving year's
    * the INSERTIONS — and [[maintainStudentSummary]] folds both into
    * the view. The oracle recomputes the slid window (min, max]
    * directly from the fact table: any group the delta fold loses,
    * fabricates, or gets bit-wrong fails the hash gate (q120's
    * equivalence, one level deeper — fact deltas instead of view-row
    * feeds). */
  val q132_ivm_maintain: Q = (s, d) => {
    val f = Star.fact(s, d)
    val yr = f.agg(min("tahun"), max("tahun")).head()
    val (minY, maxY) = (yr.getLong(0), yr.getLong(1))
    val base = studentSummaryM(f.where(col("tahun") < maxY))
    maintainStudentSummary(base,
      removed = f.where(col("tahun") === minY),
      added = f.where(col("tahun") === maxY))
      .orderBy("student")
  }

  /** q342: JOIN-VIEW incremental maintenance — the delta algebra q132
    * doesn't exercise (q132 folds fact deltas into an AGGREGATE view;
    * a view defined over a JOIN needs the three-term rule
    * ΔV = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB, and the cross term ΔA⋈ΔB is the
    * classic implementation bug — an order and its customer arriving
    * in the SAME batch silently vanish without it): orders and
    * customer each split into an ingested base and an arriving delta
    * (md5 id-hash buckets — deterministic), the view is the
    * (mktsegment, order-year) order-count/revenue rollup over the
    * join, the base view folds only base⋈base, and the maintenance
    * pass folds the three delta terms in. The oracle recomputes the
    * view from the FULL join — a lost or double-counted term moves a
    * cell and fails the hash. Revenue is exact cents (round ×100, the
    * events convention). Scale shape: the two delta join terms
    * broadcast the (dim-sized or batch-sized) delta side; the view and
    * merge are cell-bounded. */
  val q342_ivm_join: Q = (s, d) => {
    val ob = graft.ops.TextCore.idBucket(col("o_orderkey"))
    val cb = graft.ops.TextCore.idBucket(col("c_custkey"))
    val orders = s.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(year(o_orderdate) AS BIGINT)").as("yr"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
        (ob < 70).as("base_o"))
    val cust = s.read.parquet(s"$d/customer.parquet")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment").as("seg"),
        (cb < 50).as("base_c"))
    val aOld = orders.where(col("base_o")).drop("base_o")
    val dA = orders.where(!col("base_o")).drop("base_o")
    val bOld = cust.where(col("base_c")).drop("base_c")
    val dB = cust.where(!col("base_c")).drop("base_c")
    ivmJoinMerge(aOld, dA, bOld, dB).orderBy("seg", "yr")
  }

  /** q342's delta algebra over the four splits — factored so the spec
    * can pin the ΔA⋈ΔB cross term on hand rows (an order and its
    * customer arriving in the SAME batch). */
  private[graft] def ivmJoinMerge(aOld: DataFrame, dA: DataFrame,
      bOld: DataFrame, dB: DataFrame): DataFrame = {
    def viewOf(rows: DataFrame): DataFrame =
      rows.groupBy("seg", "yr")
        .agg(count(lit(1)).as("n_orders"), sum("cents").as("rev_cents"))
    val base = viewOf(aOld.join(bOld, "o_custkey"))
    // the three delta terms — ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB, each arriving side
    // broadcast (delta-sized by construction)
    val deltaRows = dA.join(broadcast(bOld), "o_custkey")
      .unionByName(aOld.join(broadcast(dB), "o_custkey"))
      .unionByName(dA.join(broadcast(dB), "o_custkey"))
    val dV = viewOf(deltaRows)
      .withColumnRenamed("n_orders", "dn").withColumnRenamed("rev_cents", "dr")
    base.join(dV, Seq("seg", "yr"), "full")
      .na.fill(0L, Seq("n_orders", "rev_cents", "dn", "dr"))
      .select(col("seg"), col("yr"),
        (col("n_orders") + col("dn")).as("n_orders"),
        (col("rev_cents") + col("dr")).as("rev_cents"))
      .where(col("n_orders") > 0)
  }

  /** q121: deletion-vector DELETE inside the correctness gate. The full
    * student summary is committed, then the low-activity cohort
    * (total_sks < 1000 — roughly the bottom half) is soft-deleted via
    * [[deleteWhere]]: the new version's data files are byte-copies (the
    * spec proves md5 identity; only the kilobyte sidecar is new), and
    * the log-resolved read serves the live view. The oracle recomputes
    * the surviving cohort from the fact table directly, so the gate
    * hashes "physical rows minus the sidecar" against "the rows that
    * were never there" — any row the DV misses, double-drops, or
    * resurrects fails the hash.
    *
    * Per-session cost split (r10): the BASE commit runs once per
    * (session, dir) — the base table is session-invariant, and
    * re-committing it per bench rep was pure write I/O with no content
    * change (q121 was an r9 driver-bench outlier). Every rep still
    * pays a full DV delete commit (byte-copy + merged sidecar — the
    * measured operation), the log-resolved read, and the retention
    * sweep; [[deleteWhere]] on the live view is idempotent in content,
    * so the served rows are identical every rep. */
  val q121_delete_vectors: Q = (s, d) => {
    val wh = scratchDir(s, d, "dv")
    graft.BuildPhase.timed {
      graft.SessionMemo.once(s, d, "dv:base") {
        writeTableVersioned(studentSummary(Star.fact(s, d)), wh, "student_summary")
      }
      deleteWhere(s, wh, "student_summary", col("total_sks") < 1000)
      vacuumVersions(wh, keep = 2)
    }
    readAt(s, wh, "student_summary", None).orderBy("student")
  }

  /** Clustered fact layout — the single-dimension Z-order/data-clustering
    * analog: range-partition the fact on `student` and sort within each
    * write task, so every file AND every parquet row group inside it
    * covers a tight student interval. A selective student predicate then
    * prunes twice from min/max statistics alone: file-level (range
    * partitioning ⇒ disjoint file intervals) and row-group-level (the
    * parquet reader skips groups whose stats exclude the predicate) —
    * without any directory partitioning, which would be the wrong tool
    * for a high-cardinality key (one directory per student). The
    * [[writeAll]] layout clusters by tahun for time pruning; this is the
    * complementary layout for student-keyed access paths. blockSize
    * shrinks row groups so sandbox-scale files have several to skip; at
    * 100 TB the default 128 MB groups play the same role.
    * PartitionPruningSpec measures the skip on identical data in sorted
    * vs unsorted layouts. */
  def writeFactClustered(spark: SparkSession, dir: String, out: String,
      sorted: Boolean, blockSize: Int = 128 * 1024 * 1024): Unit = {
    val fact = factNilaiMk(spark, dir)
    val laid =
      if (sorted) fact.repartitionByRange(4, col("student"))
        .sortWithinPartitions("student")
      // same task count, layout uncorrelated with student — the control
      else fact.repartition(4, col("course"))
    laid.write.mode("overwrite")
      .option("parquet.block.size", blockSize.toString)
      // pin the size-check interval (default adapts 100→10000 rows on
      // the previous group's average row width): flush points — and so
      // the row-group min/max stats the skip measurements assert on —
      // become a deterministic function of the rows alone (r8 ADVICE:
      // adaptive check intervals were the residual flake in the 2×
      // sorted-vs-unsorted margin)
      .option("parquet.block.size.row.check.min", "100")
      .option("parquet.block.size.row.check.max", "100")
      .parquet(out)
  }

  /** Per-dimension bucket bits for the Z-order key (16 buckets/dim). */
  private val zBits = 4

  /** Morton interleave of N [[zBits]]-bit bucket ids: dimension j's
    * bit i lands at position i·N + (N−1−j), so every dimension owns one
    * bit-lane of the key. A range predicate on ANY dimension fixes a
    * prefix of its own lane, which keeps matching rows spatially local
    * on the curve — the property that lets parquet min/max stats skip
    * row groups for each dimension from one layout. Skip selectivity
    * per dimension degrades as N grows (each added lane halves a
    * lane's weight per key bit) — 2–4 dims is the useful range, the
    * Delta ZORDER guidance. */
  private def interleaved(dims: Seq[Column]): Column = {
    val n = dims.length
    (0 until zBits).flatMap { i =>
      dims.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + (n - 1 - j))
      }
    }.reduce(_ + _)
  }

  /** value → its 2^[[zBits]]-quantile bucket id given precomputed
    * boundaries: the count of boundaries ≤ x — a broadcast-literal,
    * map-side expression. Quantile (not min/max linear) bucketing keeps
    * the curve balanced under skew. */
  private def quantileBucket(c: String, bnds: Seq[Double]): Column =
    size(filter(typedLit(bnds), b => b <= col(c).cast("double"))).cast("long")

  /** Multi-dimension clustered layout — the Z-order (OPTIMIZE ZORDER
    * BY) analog: [[writeFactClustered]] sorts by ONE key, so a range
    * predicate on any other column gets no row-group skip; here the
    * sort key is the Morton interleave of the (student, id_waktu)
    * quantile buckets, so BOTH a student range and a time range prune
    * row groups from min/max stats alone — each somewhat weaker than a
    * dedicated single-key sort on its own dimension, the standard
    * Z-order trade. Same write shape as the single-sort layout (range
    * partition + in-task sort on the key, no directory partitioning);
    * PartitionPruningSpec measures the two-dimensional skip against
    * the single-sort and uncorrelated layouts on identical rows. */
  def writeFactClusteredZ(spark: SparkSession, dir: String, out: String,
      blockSize: Int = 128 * 1024 * 1024,
      dims: Seq[String] = Seq("student", "id_waktu")): Unit = {
    val fact = factNilaiMk(spark, dir)
    // ONE bounded approxQuantile job computes EVERY dimension's
    // boundaries (dims × (2^zBits − 1) doubles to the driver — at
    // cluster scale this is the sampling pass, the Delta OPTIMIZE
    // ZORDER `range_partition_id` shape); per-column calls would scan
    // the fact pipeline once each
    val n = 1 << zBits
    val probs = (1 until n).map(_.toDouble / n).toArray
    val bnds = fact.stat.approxQuantile(dims.toArray, probs, 0.001)
    val z = interleaved(dims.zip(bnds).map {
      case (c, b) => quantileBucket(c, b.toSeq)
    })
    fact.repartitionByRange(4, z).sortWithinPartitions(z)
      .write.mode("overwrite")
      .option("parquet.block.size", blockSize.toString)
      // deterministic flush points — see writeFactClustered
      .option("parquet.block.size.row.check.min", "100")
      .option("parquet.block.size.row.check.max", "100")
      .parquet(out)
  }

  /** q48 (A10): the surrogate-keyed time dimension itself. Deliberately
    * bypasses [[memoDim]]: the benched number must measure the two-phase
    * surrogate-key BUILD every rep, not a cache read — q48 is the
    * regression sentinel for [[withSurrogateId]]. */
  val q48_dim_waktu: Q = (s, d) =>
    buildDimWaktu(s, d).orderBy("id_waktu")

  /** q49 (A17/A19/A20): write the whole star to a warehouse dir, read it
    * back, and report per-table row counts — the write path exercised
    * inside the correctness gate. */
  private val starTables = Seq("dim_waktu", "dim_nilai", "dim_matakuliah",
    "dim_mahasiswa", "fact_nilai_mk", "fact_nilai_semester")

  /** (session, dataset)-keyed scratch dir: two concurrent sessions on
    * the same sf must not race on one overwrite dir (the q49
    * convention; private[graft] — q114's index build keys the same
    * way). */
  private[graft] def scratchDir(s: SparkSession, d: String, tag: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_${tag}_" +
      s"${s.sparkContext.applicationId}_${d.replaceAll("[^a-zA-Z0-9]", "_")}"

  val q49_star_roundtrip: Q = (s, d) => {
    val warehouse = scratchDir(s, d, "warehouse")
    // serve/audit split (r16 verdict item 4): the full-star write is an
    // idempotent artifact build — paid once per session (and charged to
    // the build phase), not once per bench rep; the gated rows are the
    // read-back counts. The write path itself stays spec-covered
    // (StarBuilderSpec) and exercised here on first touch.
    graft.SessionMemo.once(s, d, "warehouse:write") {
      graft.BuildPhase.timed(writeAll(s, d, warehouse))
    }
    starTables.map { t =>
      s.read.parquet(s"$warehouse/$t")
        .agg(count(lit(1)).as("n_rows"))
        .select(lit(t).as("table_name"), col("n_rows"))
    }.reduce(_.unionAll(_)).orderBy("table_name")
  }

  /** q115: the versioned-warehouse LIFECYCLE inside the correctness
    * gate — snapshot write ([[writeAllVersioned]]), copy-on-write
    * compaction ([[compactVersioned]]), retention sweep
    * ([[vacuumVersions]] keeping only the compacted snapshot), then
    * per-table counts read back STRICTLY through the version log
    * ([[readAt]]), never via raw paths. The oracle is q49's: after
    * write → compact → vacuum, the one surviving snapshot must hold
    * exactly the source-derived star — any row lost or duplicated by
    * the packing or the sweep fails the hash gate. The lifecycle runs
    * ONCE per session (the serve/audit split, r16 verdict item 4 — it
    * had grown to 3.5% of the whole suite when every rep re-paid it);
    * re-invocations are pure version-log reads. Version-cycling
    * re-runs stay covered by StarBuilderSpec and by q153/q159, whose
    * reps still pay their writes — and by the SLOW-GATE mode (r17
    * advice item 3): `SPARK_GRAFT_FULL_LIFECYCLE=1` makes every
    * invocation re-run the whole write → compact → vacuum cycle over
    * the EXISTING log, so a periodic Verify run under that flag puts
    * repeated-compaction regressions back in front of the hash gate
    * (the oracle is idempotent across cycles by construction). */
  val q115_versioned_star: Q = (s, d) => {
    val wh = scratchDir(s, d, "vwh")
    def lifecycle(): Unit = graft.BuildPhase.timed {
      writeAllVersioned(s, d, wh)
      compactVersioned(s, wh, targetBytes = 64L * 1024 * 1024)
      vacuumVersions(wh, keep = 1)
    }
    if (sys.env.get("SPARK_GRAFT_FULL_LIFECYCLE").contains("1")) lifecycle()
    else graft.SessionMemo.once(s, d, "vwh:lifecycle") { lifecycle() }
    starTables.map { t =>
      readAt(s, wh, t)
        .agg(count(lit(1)).as("n_rows"))
        .select(lit(t).as("table_name"), col("n_rows"))
    }.reduce(_.unionAll(_)).orderBy("table_name")
  }

  val queries: Map[String, Q] = Map(
    "q48_dim_waktu" -> q48_dim_waktu,
    "q49_star_roundtrip" -> q49_star_roundtrip,
    "q115_versioned_star" -> q115_versioned_star,
    "q119_snapshot_diff" -> q119_snapshot_diff,
    "q120_cdc_apply" -> q120_cdc_apply,
    "q121_delete_vectors" -> q121_delete_vectors,
    "q130_cdc_chain" -> q130_cdc_chain,
    "q131_stats_prune" -> q131_stats_prune,
    "q132_ivm_maintain" -> q132_ivm_maintain,
    "q342_ivm_join" -> q342_ivm_join,
    "q139_stats_append" -> q139_stats_append,
    "q149_schema_evolution" -> q149_schema_evolution,
    "q150_merge_upsert" -> q150_merge_upsert,
    "q153_merge_versioned" -> q153_merge_versioned,
    "q159_checked_commit" -> q159_checked_commit)

  /** q49's per-table-count oracle, shared VERBATIM by q115: the
    * versioned lifecycle (write → compact → vacuum → readAt) must
    * serve exactly what the flat write serves. */
  private lazy val starCountsSql: String = withFactSem(
      s""", factt AS (
         |  SELECT fact.*, CASE WHEN p_size <= 25 THEN 'Persiapan' ELSE 'Sarjana' END AS tahap
         |  FROM fact JOIN part ON course = p_partkey)
         |SELECT * FROM (
         |  SELECT 'dim_waktu' AS table_name,
         |         CAST(count(DISTINCT (tahun, semester)) AS BIGINT) AS n_rows FROM fact
         |  UNION ALL
         |  SELECT 'dim_nilai', ${Star.gradeWeights.size} FROM (SELECT 1)
         |  UNION ALL
         |  SELECT 'dim_matakuliah', CAST(count(DISTINCT (course, tahap)) AS BIGINT) FROM factt
         |  UNION ALL
         |  SELECT 'dim_mahasiswa', CAST(count(DISTINCT student) AS BIGINT) FROM fact
         |  UNION ALL
         |  SELECT 'fact_nilai_mk', CAST(count(*) AS BIGINT) FROM fact
         |  UNION ALL
         |  SELECT 'fact_nilai_semester', CAST(count(*) AS BIGINT) FROM sem)
         |ORDER BY table_name""".stripMargin)

  val oracle: Map[String, String] = Map(
    "q48_dim_waktu" -> withFact(
      """SELECT CAST(dense_rank() OVER (ORDER BY tahun, semester) AS BIGINT) AS id_waktu,
        |       tahun, semester
        |FROM (SELECT DISTINCT tahun, semester FROM fact)
        |ORDER BY id_waktu""".stripMargin),
    "q49_star_roundtrip" -> starCountsSql,
    "q115_versioned_star" -> starCountsSql,
    // the CDC feed recomputed declaratively: the two window summaries
    // FULL OUTER JOINed on the key, classified, unchanged rows dropped
    "q119_snapshot_diff" -> withFact(
      s""", yrs AS (SELECT min(tahun) AS miny, max(tahun) AS maxy FROM fact),
         |s1 AS (
         |  SELECT student, CAST(count(*) AS BIGINT) AS n_rows, sum(sks) AS total_sks,
         |         ${Star.round2Sql("sum(sks*bobot) / sum(sks)")} AS gpa
         |  FROM fact WHERE tahun < (SELECT maxy FROM yrs) GROUP BY student),
         |s2 AS (
         |  SELECT student, CAST(count(*) AS BIGINT) AS n_rows, sum(sks) AS total_sks,
         |         ${Star.round2Sql("sum(sks*bobot) / sum(sks)")} AS gpa
         |  FROM fact WHERE tahun > (SELECT miny FROM yrs) GROUP BY student)
         |SELECT * FROM (
         |  SELECT coalesce(s1.student, s2.student) AS student,
         |         CASE WHEN s2.student IS NULL THEN 'delete'
         |              WHEN s1.student IS NULL THEN 'insert'
         |              ELSE 'update' END AS change_type,
         |         s1.n_rows AS old_n_rows, s1.total_sks AS old_total_sks,
         |         s1.gpa AS old_gpa,
         |         s2.n_rows AS new_n_rows, s2.total_sks AS new_total_sks,
         |         s2.gpa AS new_gpa
         |  FROM s1 FULL OUTER JOIN s2 ON s1.student = s2.student)
         |WHERE change_type <> 'update'
         |   OR old_n_rows IS DISTINCT FROM new_n_rows
         |   OR old_total_sks IS DISTINCT FROM new_total_sks
         |   OR old_gpa IS DISTINCT FROM new_gpa
         |ORDER BY student""".stripMargin),
    // base + feed must equal the new snapshot recomputed from scratch:
    // the oracle IS that recompute (q119's s2 window, stated directly)
    "q120_cdc_apply" -> withFact(
      s""", yrs AS (SELECT min(tahun) AS miny FROM fact)
         |SELECT student, CAST(count(*) AS BIGINT) AS n_rows, sum(sks) AS total_sks,
         |       ${Star.round2Sql("sum(sks*bobot) / sum(sks)")} AS gpa
         |FROM fact WHERE tahun > (SELECT miny FROM yrs)
         |GROUP BY student ORDER BY student""".stripMargin),
    // physical rows minus the deletion vector ≡ the cohort that survives
    // the predicate, recomputed from scratch
    "q121_delete_vectors" -> withFact(
      s"""SELECT student, CAST(count(*) AS BIGINT) AS n_rows, sum(sks) AS total_sks,
         |       ${Star.round2Sql("sum(sks*bobot) / sum(sks)")} AS gpa
         |FROM fact GROUP BY student HAVING NOT (sum(sks) < 1000)
         |ORDER BY student""".stripMargin),
    // catch-up via two composed feeds ≡ the newest snapshot recomputed
    // from scratch: the oracle IS that recompute (full-corpus summary)
    "q130_cdc_chain" -> withFact(
      s"""SELECT student, CAST(count(*) AS BIGINT) AS n_rows, sum(sks) AS total_sks,
         |       ${Star.round2Sql("sum(sks*bobot) / sum(sks)")} AS gpa
         |FROM fact GROUP BY student ORDER BY student""".stripMargin),
    // the band's rollup stated directly: which files the manifest let
    // the scan open must not change the rows (same contract as q135)
    "q131_stats_prune" -> withFact(
      """, b AS (SELECT min(student) AS lo,
        |               min(student) + (max(student) - min(student)) // 20 AS hi
        |        FROM fact)
        |SELECT student, CAST(count(*) AS BIGINT) AS n_rows, sum(sks) AS total_sks
        |FROM fact, b WHERE student BETWEEN lo AND hi
        |GROUP BY student ORDER BY student""".stripMargin),
    // the boundary-straddling band stated directly: which manifest
    // rows (base-built or append-grown) let the scan open files must
    // not change the rows (q131's contract through the append path)
    "q139_stats_append" -> withFact(
      """, b AS (SELECT min(student) AS lo, max(student) AS hi FROM fact),
        |bb AS (SELECT lo + (hi - lo) // 2 - (hi - lo) // 40 AS blo,
        |              lo + (hi - lo) // 2 + (hi - lo) // 40 AS bhi FROM b)
        |SELECT student, CAST(count(*) AS BIGINT) AS n_rows, sum(sks) AS total_sks
        |FROM fact, bb WHERE student BETWEEN blo AND bhi
        |GROUP BY student ORDER BY student""".stripMargin),
    // the maintained view must equal the slid window recomputed from
    // scratch — delta folding is invisible in the answer (q120's
    // the from-scratch recompute over the FULL join — a lost or
    // double-counted delta term (ΔA⋈ΔB above all) moves a cell
    "q342_ivm_join" ->
      """WITH j AS (
        |  SELECT c.c_mktsegment AS seg,
        |         CAST(year(o.o_orderdate) AS BIGINT) AS yr,
        |         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey)
        |SELECT seg, yr, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(cents) AS BIGINT) AS rev_cents
        |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // contract at fact-delta granularity)
    "q132_ivm_maintain" -> withFact(
      s""", yrs AS (SELECT min(tahun) AS miny FROM fact)
         |SELECT student, CAST(count(*) AS BIGINT) AS n_rows, sum(sks) AS total_sks,
         |       sum(sks*bobot) AS total_w,
         |       ${Star.round2Sql("sum(sks*bobot) / sum(sks)")} AS gpa
         |FROM fact WHERE tahun > (SELECT miny FROM yrs)
         |GROUP BY student ORDER BY student""".stripMargin),
    // the evolved table recomputed directly: gpa exists only where a
    // post-evolution file would carry it (the upper student half) —
    // a backfilled or lost-append read changes rows and fails the hash
    "q149_schema_evolution" -> withFact(
      s""", b AS (SELECT min(student) + (max(student) - min(student)) // 2 AS mid
         |        FROM fact)
         |SELECT student, CAST(count(*) AS BIGINT) AS n_rows, sum(sks) AS total_sks,
         |       CASE WHEN student <= (SELECT mid FROM b) THEN NULL
         |            ELSE ${Star.round2Sql("sum(sks*bobot) / sum(sks)")} END AS gpa
         |FROM fact GROUP BY student ORDER BY student""".stripMargin),
    // the MERGE's full-outer classification restated directly: source
    // row wins where matched (unless the small-sks delete fires), base
    // row survives alone, source-only rows insert regardless of size
    "q150_merge_upsert" -> mergeUpsertSql,
    // q150's oracle VERBATIM: the stage→claim→commit→resolve round trip
    // through the version log must not change a row
    "q153_merge_versioned" -> mergeUpsertSql,
    // the expectations restated as conditional aggregates over the raw
    // fact: accepted = all constraints hold, quarantined = any fails,
    // per-constraint = rows where THAT expression is literal FALSE
    // (NULL passes — the ANSI CHECK rule on both sides)
    "q159_checked_commit" -> withFact(
      """SELECT * FROM (
        |  SELECT 'accepted' AS name,
        |         CAST(count(*) FILTER (sks > 0 AND bobot > 0) AS BIGINT) AS n_rows
        |  FROM fact
        |  UNION ALL
        |  SELECT 'quarantined',
        |         CAST(count(*) FILTER (NOT (sks > 0) OR NOT (bobot > 0)) AS BIGINT)
        |  FROM fact
        |  UNION ALL
        |  SELECT 'viol_known_grade',
        |         CAST(count(*) FILTER (NOT (bobot > 0)) AS BIGINT) FROM fact
        |  UNION ALL
        |  SELECT 'viol_positive_sks',
        |         CAST(count(*) FILTER (NOT (sks > 0)) AS BIGINT) FROM fact)
        |WHERE n_rows > 0 OR name IN ('accepted', 'quarantined')
        |ORDER BY name""".stripMargin))

  /** The q150 MERGE oracle, shared VERBATIM by q153 (the same merge run
    * through the version log). */
  private lazy val mergeUpsertSql: String = withFact(
      s""", yrs AS (SELECT max(tahun) AS maxy FROM fact),
         |b AS (
         |  SELECT student, CAST(count(*) AS BIGINT) AS n_rows, sum(sks) AS total_sks,
         |         ${Star.round2Sql("sum(sks*bobot) / sum(sks)")} AS gpa
         |  FROM fact WHERE tahun < (SELECT maxy FROM yrs)
         |    AND ${graft.ops.TextCore.idBucketSql("student")} < 90
         |  GROUP BY student),
         |sr AS (
         |  SELECT student, CAST(count(*) AS BIGINT) AS n_rows, sum(sks) AS total_sks,
         |         ${Star.round2Sql("sum(sks*bobot) / sum(sks)")} AS gpa
         |  FROM fact WHERE tahun = (SELECT maxy FROM yrs)
         |  GROUP BY student)
         |SELECT student, n_rows, total_sks, gpa FROM (
         |  SELECT coalesce(sr.student, b.student) AS student,
         |         CASE WHEN sr.student IS NOT NULL THEN sr.n_rows ELSE b.n_rows END AS n_rows,
         |         CASE WHEN sr.student IS NOT NULL THEN sr.total_sks ELSE b.total_sks END AS total_sks,
         |         CASE WHEN sr.student IS NOT NULL THEN sr.gpa ELSE b.gpa END AS gpa,
         |         (sr.student IS NOT NULL AND b.student IS NOT NULL
         |          AND sr.total_sks < 60) AS del
         |  FROM b FULL OUTER JOIN sr ON b.student = sr.student)
         |WHERE NOT del ORDER BY student""".stripMargin)
}
