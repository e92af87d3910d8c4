package graft.catalog

import java.nio.file.Files

import graft.TestSpark
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Orphan-file GC (CatalogIO.sweepOrphanFiles — the remove-orphan-files
  * maintenance face): crash/race residue no version references is
  * reclaimed; everything any version references — and anything younger
  * than the grace window — survives. */
class OrphanSweepSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def freshTable(): (HadoopFsCatalog, TableRef, Path) = {
    val wh = Files.createTempDirectory("sweep-wh").toString
    val hc = new HadoopFsCatalog("sweep", wh)
    hc.createNamespace(Namespace.of("db"))
    val ref = TableRef.parse("db.t")
    (hc, ref, hc.tableDir(ref))
  }

  private def batch(lo: Int, n: Int): DataFrame =
    spark.sql(s"SELECT id AS k, concat('v', id) AS s FROM range($lo, ${lo + n})")

  private def rowsOf(hc: HadoopFsCatalog, ref: TableRef): Seq[Long] =
    CatalogIO.readTable(spark, hc, ref)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq

  test("sweeps crash residue; keeps every version's files; grace protects young files") {
    val (hc, ref, dir) = freshTable()
    CatalogIO.createTable(spark, hc, ref, batch(0, 10))    // v1
    CatalogIO.commitAppend(spark, hc, ref, batch(100, 5))  // v2
    val fs = hc.fileSystem
    val segment = new Path(CatalogIO.readLayout(
      hc.loadTableMetadataLocation(ref)).dataLocation)
    // plant the three crash shapes: a file moved into the live segment
    // by a lost append, a stale staging tree, and a raced full-snapshot
    // commit's whole data dir
    val orphanInSegment = new Path(segment, "part-orphan-lostappend.parquet")
    fs.create(orphanInSegment).close()
    val stage = new Path(dir, "stage-v9-deadbeef")
    fs.mkdirs(new Path(stage, "_temporary"))
    fs.create(new Path(stage, "part-000.parquet")).close()
    val racedDir = new Path(dir, "data-v9-cafebabe")
    fs.mkdirs(racedDir)
    fs.create(new Path(racedDir, "part-001.parquet")).close()

    val before = rowsOf(hc, ref)
    // young files are protected by the grace window
    val protectedSweep = CatalogIO.sweepOrphanFiles(hc, ref, graceMs = 3600000L)
    assert(protectedSweep.deletedFiles == 0)
    assert(fs.exists(orphanInSegment))
    // grace 0: everything old enough (everything) is eligible
    val res = CatalogIO.sweepOrphanFiles(hc, ref, graceMs = -1000L)
    assert(res.deletedFiles >= 3, s"expected the planted orphans swept: $res")
    assert(!fs.exists(orphanInSegment) && !fs.exists(stage) && !fs.exists(racedDir))
    // current AND historical reads unchanged
    assert(rowsOf(hc, ref) == before)
    assert(CatalogIO.readTableVersion(spark, hc, ref, 1).count() == 10)
    // idempotent: a second sweep finds nothing
    assert(CatalogIO.sweepOrphanFiles(hc, ref, graceMs = -1000L).deletedFiles == 0)
  }

  test("expire + sweep reclaims partially-compacted files inside a surviving segment") {
    val (hc, ref, _) = freshTable()
    CatalogIO.createTable(spark, hc, ref, batch(0, 10))
    (1 to 4).foreach(i => CatalogIO.commitAppend(spark, hc, ref, batch(i * 100, 5)))
    // partial compaction: small files merge, replaced files stay on
    // disk for the PRIOR versions that reference them
    val inc = CatalogIO.compactSmallFiles(spark, hc, ref, smallFileBytes = 1L << 20)
    assert(inc.compacted)
    val before = rowsOf(hc, ref)
    // still referenced by history -> replaced files survive (only
    // write-marker debris like _SUCCESS is reclaimable), and every
    // version keeps reading
    CatalogIO.sweepOrphanFiles(hc, ref, graceMs = -1000L)
    assert(rowsOf(hc, ref) == before)
    assert(CatalogIO.readTableVersion(spark, hc, ref, 1).count() == 10)
    // expiry drops the referencing versions; the segment survives (the
    // current version lives there) but the replaced files are orphans
    CatalogIO.expireVersions(hc, ref, keepLast = 1)
    val res = CatalogIO.sweepOrphanFiles(hc, ref, graceMs = -1000L)
    assert(res.deletedFiles > 0 && res.reclaimedBytes > 0)
    assert(rowsOf(hc, ref) == before)
  }

  test("an empty table's data dir survives the sweep and stays appendable") {
    val (hc, ref, _) = freshTable()
    CatalogIO.createEmptyTable(spark, hc, ref,
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, s STRING"))
    assert(CatalogIO.sweepOrphanFiles(hc, ref, graceMs = -1000L).deletedFiles == 0)
    CatalogIO.commitAppend(spark, hc, ref, batch(0, 3))
    assert(rowsOf(hc, ref) == Seq(0L, 1L, 2L))
  }
}
