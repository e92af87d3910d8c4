package graft.catalog

import java.nio.file.Files

import graft.TestSpark
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Table versioning + time travel over the `v<N>.metadata.json` pointer
  * history (the Iceberg snapshot model the reference rides on,
  * CatalogMigrator.java:212-213): commitVersion advances the pointer
  * crash-safely, old versions stay readable through the catalog API and
  * SQL `VERSION AS OF`, and the commit race loses cleanly.
  */
class TimeTravelSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def newCat(prefix: String): HadoopFsCatalog =
    CatalogFactory.build(CatalogConfig("hadoop", prefix,
      Map("warehouse" -> Files.createTempDirectory(prefix).toString)))
      .asInstanceOf[HadoopFsCatalog]

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

  test("commitVersion advances the current read; old versions stay readable") {
    import spark.implicits._
    val cat = newCat("tt-wh")
    val ref = TableRef.parse("db.versioned")
    val v1 = Seq((1L, "one"), (2L, "two")).toDF("id", "v")
    val v2 = Seq((1L, "one"), (3L, "three"), (4L, "four")).toDF("id", "v")

    CatalogIO.createTable(spark, cat, ref, v1)
    assert(cat.listTableVersions(ref) == Seq(1))

    val metaLoc2 = CatalogIO.commitVersion(spark, cat, ref, v2)
    assert(cat.listTableVersions(ref) == Seq(1, 2))
    assert(cat.loadTableMetadataLocation(ref) == metaLoc2)

    // current read serves v2; VERSION AS OF 1 serves the pre-commit rows
    assert(rows(CatalogIO.readTable(spark, cat, ref)) ==
      Seq((1L, "one"), (3L, "three"), (4L, "four")))
    assert(rows(CatalogIO.readTableVersion(spark, cat, ref, 1)) ==
      Seq((1L, "one"), (2L, "two")))
    assert(rows(CatalogIO.readTableVersion(spark, cat, ref, 2)) ==
      Seq((1L, "one"), (3L, "three"), (4L, "four")))

    val e = intercept[NoSuchTableException] {
      CatalogIO.readTableVersion(spark, cat, ref, 3)
    }
    assert(e.getMessage.contains("no version 3"))
    cat.close()
  }

  test("SQL VERSION AS OF resolves historical versions through DSv2") {
    import spark.implicits._
    val wh = Files.createTempDirectory("tt-sql-wh").toString
    val cat = CatalogFactory.build(CatalogConfig("hadoop", "ttsql",
      Map("warehouse" -> wh))).asInstanceOf[HadoopFsCatalog]
    val ref = TableRef.parse("db.t")
    CatalogIO.createTable(spark, cat, ref, Seq((1L, "a")).toDF("id", "v"))
    CatalogIO.commitVersion(spark, cat, ref, Seq((2L, "b"), (3L, "c")).toDF("id", "v"))

    spark.conf.set("spark.sql.catalog.gtt",
      classOf[graft.sources.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtt.type", "hadoop")
    spark.conf.set("spark.sql.catalog.gtt.warehouse", wh)

    assert(rows(spark.sql("SELECT id, v FROM gtt.db.t")) ==
      Seq((2L, "b"), (3L, "c")))
    assert(rows(spark.sql("SELECT id, v FROM gtt.db.t VERSION AS OF 1")) ==
      Seq((1L, "a")))
    assert(rows(spark.sql("SELECT id, v FROM gtt.db.t VERSION AS OF 2")) ==
      Seq((2L, "b"), (3L, "c")))

    // a missing VERSION on an EXISTING table keeps the history
    // diagnostic instead of claiming the table doesn't exist
    val miss = intercept[Exception] {
      spark.sql("SELECT id, v FROM gtt.db.t VERSION AS OF 99").collect()
    }
    assert(miss.getMessage.contains("no version 99"), miss.getMessage)
    assert(miss.getMessage.contains("history: 1, 2"), miss.getMessage)
    cat.close()
  }

  test("an aborted create (lone v1, no pointer) stays invisible; retry gets a debris error") {
    import spark.implicits._
    val cat = newCat("tt-abort-wh")
    val ref = TableRef.parse("db.halfmade")
    CatalogIO.createTable(spark, cat, ref, Seq((1L, "a")).toDF("id", "v"))
    // simulate a crash between the v1 metadata write and the pointer
    // commit: metadata + data exist, pointer never landed
    val ptr = new Path(cat.tableDir(ref), "pointer.text")
    assert(cat.fileSystem.delete(ptr, false))

    // invisible: a lone v1 without a pointer must NOT be auto-published
    // (the roll-forward fallback is only for the ≥2-version mid-flip
    // window of an already-committed table)
    assert(!cat.tableExists(ref))
    intercept[NoSuchTableException] { cat.loadTableMetadataLocation(ref) }

    // the creator's retry is told exactly what is in the way
    val e = intercept[AlreadyExistsException] {
      CatalogIO.createTable(spark, cat, ref, Seq((1L, "a")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("Aborted-create debris"), e.getMessage)
    // operator remediation: remove the dir, recreate cleanly
    cat.fileSystem.delete(cat.tableDir(ref), true)
    CatalogIO.createTable(spark, cat, ref, Seq((2L, "b")).toDF("id", "v"))
    assert(rows(CatalogIO.readTable(spark, cat, ref)) == Seq((2L, "b")))
    cat.close()
  }

  test("commit data dirs are attempt-unique: orphans from crashed attempts never block") {
    import spark.implicits._
    val cat = newCat("tt-orphan-wh")
    val ref = TableRef.parse("db.orphaned")
    CatalogIO.createTable(spark, cat, ref, Seq((1L, "a")).toDF("id", "v"))
    // simulate a rival committer that wrote its data dir for v2 and
    // crashed before the metadata gate — under a DETERMINISTIC data-v2
    // path this would brick every future commit with path-already-exists
    cat.fileSystem.mkdirs(new Path(cat.tableDir(ref), "data-v2-deadbeef"))

    val metaLoc2 = CatalogIO.commitVersion(spark, cat, ref,
      Seq((2L, "b")).toDF("id", "v"))
    assert(metaLoc2.endsWith("v2.metadata.json"))
    assert(rows(CatalogIO.readTable(spark, cat, ref)) == Seq((2L, "b")))
    // the orphan is unreferenced, not served
    assert(!CatalogIO.readDataLocation(metaLoc2).contains("deadbeef"))
    cat.close()
  }

  test("a reader in the pointer delete->rename window rolls forward and self-heals") {
    import spark.implicits._
    val cat = newCat("tt-crash-wh")
    val ref = TableRef.parse("db.crashy")
    CatalogIO.createTable(spark, cat, ref, Seq((1L, "a")).toDF("id", "v"))
    val metaLoc2 = CatalogIO.commitVersion(spark, cat, ref,
      Seq((2L, "b")).toDF("id", "v"))

    // simulate the crash window: pointer deleted, rename never happened
    val ptr = new Path(cat.tableDir(ref), "pointer.text")
    assert(cat.fileSystem.delete(ptr, false))

    // the table is still visible and loads the newest committed version
    // (the fallback path comes back fs-qualified — compare the path part)
    assert(cat.tableExists(ref))
    assert(new Path(cat.loadTableMetadataLocation(ref)).toUri.getPath ==
      new Path(metaLoc2).toUri.getPath)
    // ... and the read healed the pointer for subsequent readers
    assert(cat.fileSystem.exists(ptr))
    assert(rows(CatalogIO.readTable(spark, cat, ref)) == Seq((2L, "b")))
    cat.close()
  }

  test("concurrent version commits race on the metadata file; loser throws") {
    import spark.implicits._
    val cat = newCat("tt-race-wh")
    val ref = TableRef.parse("db.raced")
    CatalogIO.createTable(spark, cat, ref, Seq((1L, "a")).toDF("id", "v"))

    // Two committers that both read latest=1 both target v2.metadata.json;
    // the winner's create-exclusive write (fs.create(overwrite = false))
    // lands first, the loser's throws — the gate commitVersion rides.
    val contested = new Path(new Path(cat.tableDir(ref), "metadata"), "v2.metadata.json")
    cat.writeText(contested, "{\"winner\": true}")
    intercept[Exception] { cat.writeText(contested, "{\"loser\": true}") }
    // the winner's content is intact and the pointer is undamaged
    assert(cat.readText(contested).contains("winner"))
    assert(cat.loadTableMetadataLocation(ref).endsWith("v1.metadata.json"))

    // a committer arriving AFTER the rival's commit sees latest=2 and
    // cleanly takes v3 — version numbers never collide or regress
    val metaLoc3 = CatalogIO.commitVersion(spark, cat, ref,
      Seq((9L, "z")).toDF("id", "v"))
    assert(metaLoc3.endsWith("v3.metadata.json"))
    assert(cat.listTableVersions(ref) == Seq(1, 2, 3))
    cat.close()
  }

  test("registered (external-metadata) tables have no local version history") {
    import spark.implicits._
    val src = newCat("tt-ext-src")
    val tgt = newCat("tt-ext-tgt")
    val ref = TableRef.parse("ns.t")
    CatalogIO.createTable(spark, src, ref, Seq((1L, "a")).toDF("id", "v"))
    tgt.createNamespace(Namespace.of("ns"))
    tgt.registerTable(ref, src.loadTableMetadataLocation(ref))

    assert(tgt.listTableVersions(ref) == Seq.empty)
    val e = intercept[IllegalStateException] {
      CatalogIO.commitVersion(spark, tgt, ref, Seq((2L, "b")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("no local metadata history"))
    src.close(); tgt.close()
  }
}
