package graft.catalog

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The migrator scenario matrix — plus the version-control surface no
  * other backend has — against the [[NessieCatalog]] commit-log store.
  * Mirrors the reference's NESSIE catalog kind
  * (CatalogMigrationUtil.java:36-46; nested namespaces and
  * namespace-creation-on-migrate tested by the reference at
  * ITHadoopToNessieCatalogMigrator.java:45-121). */
class NessieCatalogSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def uid(): String =
    java.util.UUID.randomUUID().toString.take(8).replace("-", "")

  private def store(): String =
    Files.createTempDirectory("graft-nessie").toString

  private def seedCanonical(cfg: CatalogConfig): Unit = {
    val stage = new HadoopFsCatalog(s"stage-${uid()}",
      Files.createTempDirectory("graft-stage").toString)
    val cat = CatalogFactory.build(cfg)
    try {
      Seq("foo", "bar").foreach(ns => cat.createNamespace(Namespace.of(ns)))
      import spark.implicits._
      Seq("foo.tbl1", "foo.tbl2", "bar.tbl3", "bar.tbl4").map(TableRef.parse)
        .zipWithIndex.foreach { case (ref, i) =>
          val df = (1L to 5L).map(x => x * (i + 1)).toDF("id")
          cat.registerTable(ref, CatalogIO.createTable(spark, stage, ref, df))
        }
    } finally cat.close()
  }

  test("namespace and pointer semantics match the other backends") {
    val cat = new NessieCatalog(s"nc${uid()}", store())
    try {
      cat.createNamespace(Namespace.of("a"))
      cat.createNamespace(Namespace.of("a", "b"))
      intercept[AlreadyExistsException](cat.createNamespace(Namespace.of("a")))
      assert(cat.listNamespaces(Namespace.empty) == Seq(Namespace.of("a")))
      assert(cat.listNamespaces(Namespace.of("a")) == Seq(Namespace.of("a", "b")))
      intercept[NoSuchNamespaceException](cat.listNamespaces(Namespace.of("zz")))

      val ref = TableRef.parse("a.t1")
      intercept[NoSuchTableException](cat.loadTableMetadataLocation(ref))
      intercept[NoSuchNamespaceException](
        cat.registerTable(TableRef.parse("zz.t"), "loc"))
      cat.registerTable(ref, "/meta/v1.metadata.json")
      assert(cat.loadTableMetadataLocation(ref) == "/meta/v1.metadata.json")
      intercept[AlreadyExistsException](cat.registerTable(ref, "other"))
      assert(cat.listTables(Namespace.of("a")) == Seq(ref))
      assert(cat.dropTable(ref))
      assert(!cat.dropTable(ref))
    } finally cat.close()
  }

  test("every mutation is a commit; any old hash reads as a full snapshot") {
    val dir = store()
    val cat = new NessieCatalog(s"nc${uid()}", dir)
    try {
      cat.createNamespace(Namespace.of("db"))
      cat.registerTable(TableRef.parse("db.t1"), "loc1")
      val beforeT2 = cat.currentHash
      cat.registerTable(TableRef.parse("db.t2"), "loc2")
      cat.dropTable(TableRef.parse("db.t1"))

      val log = cat.commitLog()
      assert(log.size == 4) // ns + t1 + t2 + drop, newest first
      assert(log.head.message == "drop table db.t1")
      assert(log.last.message == "create namespace db")

      // detached read at the old hash: t1 exists, t2 does not — a
      // consistent point-in-time view of the WHOLE catalog
      val old = new NessieCatalog("old", dir, ref = beforeT2)
      try {
        assert(old.listTables(Namespace.of("db")) == Seq(TableRef.parse("db.t1")))
        assert(old.loadTableMetadataLocation(TableRef.parse("db.t1")) == "loc1")
        // detached refs refuse writes
        intercept[UnsupportedOperationException](
          old.registerTable(TableRef.parse("db.t3"), "loc3"))
      } finally old.close()

      // current view: only t2
      assert(cat.listTables(Namespace.of("db")) == Seq(TableRef.parse("db.t2")))
    } finally cat.close()
  }

  test("branch isolation and fast-forward merge") {
    val dir = store()
    val main = new NessieCatalog(s"nc${uid()}", dir)
    try {
      main.createNamespace(Namespace.of("db"))
      main.registerTable(TableRef.parse("db.base"), "base-loc")
      main.createBranch("etl")

      val etl = new NessieCatalog("etl-view", dir, ref = "etl")
      try {
        etl.registerTable(TableRef.parse("db.staged"), "staged-loc")
        // branch sees both; main is untouched
        assert(etl.listTables(Namespace.of("db")).map(_.name).toSet == Set("base", "staged"))
        assert(main.listTables(Namespace.of("db")).map(_.name) == Seq("base"))
        // promote: fast-forward merge etl → main
        main.merge("etl")
        assert(main.listTables(Namespace.of("db")).map(_.name).toSet == Set("base", "staged"))
        assert(main.currentHash == etl.currentHash)
      } finally etl.close()
    } finally main.close()
  }

  test("three-way merge applies disjoint changes and refuses conflicting keys") {
    val dir = store()
    val main = new NessieCatalog(s"nc${uid()}", dir)
    try {
      main.createNamespace(Namespace.of("db"))
      main.createBranch("dev")
      val dev = new NessieCatalog("dev-view", dir, ref = "dev")
      try {
        // diverge: disjoint keys on each side
        dev.registerTable(TableRef.parse("db.from_dev"), "dev-loc")
        main.registerTable(TableRef.parse("db.from_main"), "main-loc")
        main.merge("dev")
        assert(main.listTables(Namespace.of("db")).map(_.name).toSet ==
          Set("from_dev", "from_main"))

        // conflict: both sides now register the SAME key differently
        main.createBranch("dev2")
        val dev2 = new NessieCatalog("dev2-view", dir, ref = "dev2")
        try {
          dev2.registerTable(TableRef.parse("db.clash"), "dev2-loc")
          main.registerTable(TableRef.parse("db.clash"), "main-loc2")
          val e = intercept[CommitConflictException](main.merge("dev2"))
          assert(e.getMessage.contains("db.clash"))
        } finally dev2.close()
      } finally dev.close()
    } finally main.close()
  }

  test("tags are immutable readable snapshots; default branch undeletable") {
    val dir = store()
    val main = new NessieCatalog(s"nc${uid()}", dir)
    try {
      main.createNamespace(Namespace.of("db"))
      main.registerTable(TableRef.parse("db.t"), "v1-loc")
      main.createTag("release-1")
      main.dropTable(TableRef.parse("db.t"))

      val tagged = new NessieCatalog("rel", dir, ref = "release-1")
      try {
        assert(tagged.loadTableMetadataLocation(TableRef.parse("db.t")) == "v1-loc")
        val e = intercept[UnsupportedOperationException](
          tagged.registerTable(TableRef.parse("db.x"), "loc"))
        assert(e.getMessage.contains("tag"))
      } finally tagged.close()

      intercept[AlreadyExistsException](main.createTag("release-1"))
      intercept[IllegalArgumentException](main.deleteReference("main"))
      main.deleteReference("release-1")
      intercept[NoSuchNamespaceException](main.resolveRef("release-1"))
    } finally main.close()
  }

  test("commitMulti is atomic and CAS-guarded; single-op faces retry races") {
    val dir = store()
    val a = new NessieCatalog(s"nc${uid()}", dir)
    val b = new NessieCatalog("b-view", dir)
    try {
      a.createNamespace(Namespace.of("db"))
      val head = a.currentHash
      // an atomic multi-table commit: both pointers land in ONE commit
      a.commitMulti("publish batch", Seq(
        NessieOp.PutTable("db.x", "x-loc"), NessieOp.PutTable("db.y", "y-loc")),
        expectedHead = Some(head))
      assert(a.commitLog().head.ops.size == 2)
      // a CAS against the stale head fails without landing anything
      val e = intercept[CommitConflictException](
        a.commitMulti("stale", Seq(NessieOp.PutTable("db.z", "z-loc")),
          expectedHead = Some(head)))
      assert(e.getMessage.contains("advanced"))
      assert(!a.tableExists(TableRef.parse("db.z")))
      // single-op faces revalidate + retry internally: interleaved writers
      // on the same branch both land
      a.registerTable(TableRef.parse("db.t_a"), "a-loc")
      b.registerTable(TableRef.parse("db.t_b"), "b-loc")
      assert(a.listTables(Namespace.of("db")).map(_.name).toSet ==
        Set("x", "y", "t_a", "t_b"))
      // and a racing register of the SAME key surfaces as AlreadyExists
      intercept[AlreadyExistsException](
        b.registerTable(TableRef.parse("db.t_a"), "other"))
    } finally { a.close(); b.close() }
  }

  test("the racing-commit matrix holds over a KvStore-backed ref store (CAS, no locks)") {
    // ref-store=kv: branch-head CAS rides KvStore.replace (the DynamoDB/
    // ECS conditional write) — same commit protocol, zero lock files
    val dir = store()
    val kvId = s"nessie-kv-${uid()}"
    def open(view: String, ref: String = NessieCatalog.DefaultBranch) =
      new NessieCatalog(view, dir, ref = ref,
        kvRefStore = Some(MemoryKvStore.forId(kvId)))
    val a = open(s"nc${uid()}")
    val b = open("b-view")
    try {
      a.createNamespace(Namespace.of("db"))
      val head = a.currentHash
      a.commitMulti("publish batch", Seq(
        NessieOp.PutTable("db.x", "x-loc"), NessieOp.PutTable("db.y", "y-loc")),
        expectedHead = Some(head))
      assert(a.commitLog().head.ops.size == 2)
      // stale-head CAS refuses without landing anything
      val e = intercept[CommitConflictException](
        a.commitMulti("stale", Seq(NessieOp.PutTable("db.z", "z-loc")),
          expectedHead = Some(head)))
      assert(e.getMessage.contains("advanced"))
      assert(!a.tableExists(TableRef.parse("db.z")))
      // interleaved single-op writers both land; same-key race surfaces
      a.registerTable(TableRef.parse("db.t_a"), "a-loc")
      b.registerTable(TableRef.parse("db.t_b"), "b-loc")
      intercept[AlreadyExistsException](
        b.registerTable(TableRef.parse("db.t_a"), "other"))
      // genuinely concurrent commits: every one lands exactly once and
      // the log is one linear CAS-serialized chain
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration._
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        val futures = (0 until 8).map { t =>
          Future {
            val view = open(s"racer-$t")
            try (0 until 5).foreach(i =>
              view.registerTable(TableRef.parse(s"db.race_${t}_$i"), s"loc-$t-$i"))
            finally view.close()
          }
        }
        Await.result(Future.sequence(futures), 60.seconds)
      } finally pool.shutdown()
      val names = a.listTables(Namespace.of("db")).map(_.name).toSet
      assert((0 until 8).forall(t => (0 until 5).forall(i => names(s"race_${t}_$i"))))
      // the chain is linear back to the empty hash (no lost commit)
      val log = a.commitLog()
      assert(log.size >= 40)
      assert(log.last.parent == NessieCatalog.EmptyHash)
      // branch/tag surface works over kv refs too
      a.createTag("kv-tag", None)
      assert(a.resolveRef("kv-tag") == a.currentHash)
      a.createBranch("kv-dev", None)
      val dev = open("dev-view", ref = "kv-dev")
      try {
        dev.registerTable(TableRef.parse("db.dev_only"), "dev-loc")
        assert(!a.tableExists(TableRef.parse("db.dev_only")))
        a.merge("kv-dev")
        assert(a.tableExists(TableRef.parse("db.dev_only")))
      } finally dev.close()
      a.deleteReference("kv-dev")
      intercept[NoSuchNamespaceException](a.resolveRef("kv-dev"))
    } finally { a.close(); b.close() }
  }

  test("CatalogFactory wires ref-store=kv; file and kv stores are independent planes") {
    val dir = store()
    val kvId = s"nessie-kv-${uid()}"
    val cfg = CatalogConfig("nessie", s"nc${uid()}",
      Map("store" -> dir, "ref-store" -> "kv", "ref-store-id" -> kvId))
    val cat = CatalogFactory.build(cfg).asInstanceOf[NessieCatalog]
    try {
      cat.createNamespace(Namespace.of("db"))
      cat.registerTable(TableRef.parse("db.t"), "loc-1")
      assert(cat.loadTableMetadataLocation(TableRef.parse("db.t")) == "loc-1")
      // refs live in the KV store, not as files
      val kv = MemoryKvStore.forId(kvId)
      assert(kv.scanPrefix(s"$dir/refs/").nonEmpty)
      val refsDir = new java.io.File(dir, "refs")
      assert(!refsDir.exists() || refsDir.listFiles().forall(_.getName.startsWith(".")),
        "kv-backed refs must not be written as ref files")
    } finally cat.close()
  }

  test("per-table pointer history serves SupportsTableVersions from the log") {
    val dir = store()
    val cat = new NessieCatalog(s"nc${uid()}", dir)
    try {
      cat.createNamespace(Namespace.of("db"))
      val ref = TableRef.parse("db.t")
      cat.registerTable(ref, "loc-v1")
      cat.dropTable(ref)
      cat.registerTable(ref, "loc-v2")
      assert(cat.listTableVersions(ref) == Seq(1, 2))
      assert(cat.metadataLocationForVersion(ref, 1) == "loc-v1")
      assert(cat.metadataLocationForVersion(ref, 2) == "loc-v2")
      intercept[NoSuchTableException](cat.metadataLocationForVersion(ref, 3))
      intercept[NoSuchTableException](
        cat.listTableVersions(TableRef.parse("db.never")))
    } finally cat.close()
  }

  test("full migrate mem→nessie: registered, source deleted, data readable") {
    val srcCfg = CatalogConfig("memory", s"mem-${uid()}")
    seedCanonical(srcCfg)
    val tgtCfg = CatalogConfig("nessie", s"nc${uid()}", Map("store" -> store()))
    val m = new CatalogMigrator(srcCfg, tgtCfg, deleteEntriesFromSourceCatalog = true)
    val ids = m.getMatchingTableIdentifiers(None)
    assert(ids.map(_.toString).toSet ==
      Set("foo.tbl1", "foo.tbl2", "bar.tbl3", "bar.tbl4"))
    m.registerTables(spark, ids)
    val r = m.result()
    assert(r.registeredTableIdentifiers.size == 4)
    assert(r.failedToRegisterTableIdentifiers.isEmpty)
    assert(r.failedToDeleteTableIdentifiers.isEmpty)
    val tgt = CatalogFactory.build(tgtCfg)
    try {
      assert(tgt.listTables(Namespace.of("foo")).map(_.toString).toSet ==
        Set("foo.tbl1", "foo.tbl2"))
      val loc = tgt.loadTableMetadataLocation(TableRef.parse("bar.tbl3"))
      val rows = spark.read.parquet(CatalogIO.readDataLocation(loc))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(rows == Seq(3L, 6L, 9L, 12L, 15L))
      // the whole migration is on the log: 4 registers + 2 namespace commits
      assert(tgt.asInstanceOf[NessieCatalog].commitLog().size == 6)
    } finally tgt.close()
    val src = CatalogFactory.build(srcCfg)
    try assert(src.listTables(Namespace.of("foo")).isEmpty)
    finally src.close()
  }

  test("CLI migrate into a nessie target: exit 0, pointers on the branch") {
    val srcCfg = CatalogConfig("memory", s"mem-${uid()}")
    seedCanonical(srcCfg)
    val dir = store()
    val outDir = Files.createTempDirectory("graft-nessie-cli").toString
    val code = graft.cli.CatalogMigrationCLI.run(Seq("migrate",
      "--source-catalog-type", "memory",
      "--source-catalog-properties", s"name=${srcCfg.name}",
      "--target-catalog-type", "nessie",
      "--target-catalog-properties", s"store=$dir",
      "--disable-safety-prompts", "--output-dir", outDir),
      readLine = () => "yes", out = _ => ())
    assert(code == 0)
    val tgt = new NessieCatalog("check", dir)
    try assert(tgt.listTables(Namespace.of("foo")).map(_.toString).toSet ==
      Set("foo.tbl1", "foo.tbl2"))
    finally tgt.close()
  }

  test("squashHistory collapses old commits; gcStore reclaims unreachable objects") {
    val dir = store()
    val cat = new NessieCatalog(s"nc${uid()}", dir)
    try {
      cat.createNamespace(Namespace.of("db"))
      (1 to 4).foreach(i => cat.registerTable(TableRef.parse(s"db.t$i"), s"loc$i"))
      cat.createTag("mid") // pins the pre-squash chain
      assert(cat.commitLog().size == 5)

      cat.squashHistory(keepLast = 2)
      // state identical, history = snapshot root + the 2 kept commits
      assert(cat.listTables(Namespace.of("db")).map(_.name).toSet ==
        Set("t1", "t2", "t3", "t4"))
      assert(cat.commitLog().size == 3)
      assert(cat.commitLog().last.parent == NessieCatalog.EmptyHash)
      assert(cat.loadTableMetadataLocation(TableRef.parse("db.t1")) == "loc1")
      // the tag still reads the full pre-squash chain (objects retained)
      val mid = new NessieCatalog("mid-view", dir, ref = "mid")
      try assert(mid.commitLog().size == 5) finally mid.close()

      // drop the tag: the old chain becomes unreachable; gc reclaims it
      cat.deleteReference("mid")
      assert(cat.gcStore(graceMillis = -60000) == 5)
      assert(cat.gcStore(graceMillis = -60000) == 0) // idempotent
      // a FRESH instance (cold caches) proves survivors are complete
      val fresh = new NessieCatalog("fresh", dir)
      try {
        assert(fresh.listTables(Namespace.of("db")).size == 4)
        assert(fresh.commitLog().size == 3)
      } finally fresh.close()
    } finally cat.close()
  }

  test("CLI squash-history: squashes and GCs a nessie store, refuses elsewhere") {
    val dir = store()
    val cfg = CatalogConfig("nessie", s"nc${uid()}", Map("store" -> dir))
    seedCanonical(cfg) // 2 namespaces + 4 registers = 6 commits
    val outDir = Files.createTempDirectory("graft-nessie-squash").toString
    var lines = Vector.empty[String]
    val code = graft.cli.CatalogMigrationCLI.run(Seq("squash-history",
      "--catalog-type", "nessie", "--catalog-properties", s"store=$dir",
      "--keep-last", "1", "--gc", "--output-dir", outDir),
      readLine = () => "yes", out = l => lines :+= l)
    assert(code == 0)
    assert(lines.exists(_.contains("Squashed branch 'main': 6 -> 2 commits.")))
    assert(lines.exists(_.contains("GC reclaimed 6 unreachable commit objects.")))
    val cat = CatalogFactory.build(cfg)
    try assert(cat.listTables(Namespace.of("foo")).size == 2)
    finally cat.close()
    // a non-commit-log catalog refuses (exit 1)
    assert(graft.cli.CatalogMigrationCLI.run(Seq("squash-history",
      "--catalog-type", "memory", "--catalog-properties", s"name=x${uid()}",
      "--keep-last", "1", "--output-dir", outDir),
      readLine = () => "yes", out = _ => ()) == 1)
    // missing --keep-last is an argument error (exit 2)
    assert(graft.cli.CatalogMigrationCLI.run(Seq("squash-history",
      "--catalog-type", "nessie", "--catalog-properties", s"store=$dir",
      "--output-dir", outDir),
      readLine = () => "yes", out = _ => ()) == 2)
  }

  test("atomic cross-table publish: branch readers see all-old or all-new, never a mix") {
    val dir = store()
    val wh = Files.createTempDirectory("graft-nessie-wh").toString
    val hadoop = new HadoopFsCatalog(s"wh-${uid()}", wh)
    val nessie = new NessieCatalog(s"nc${uid()}", dir)
    try {
      import spark.implicits._
      val (orders, totals) = (TableRef.parse("db.orders"), TableRef.parse("db.totals"))
      val v1Orders = CatalogIO.createTable(spark, hadoop, orders, Seq(1L, 2L).toDF("id"))
      val v1Totals = CatalogIO.createTable(spark, hadoop, totals, Seq(2L).toDF("id"))
      nessie.publish(Map(orders -> v1Orders, totals -> v1Totals), "publish v1")
      nessie.createTag("v1")

      // stage v2 of BOTH tables in the warehouse: the Hadoop catalog's
      // per-table pointers advance, but the Nessie branch still serves
      // the consistent v1 pair until the publish commit
      val v2Orders = CatalogIO.commitVersion(spark, hadoop, orders,
        Seq(1L, 2L, 3L).toDF("id"))
      val v2Totals = CatalogIO.commitVersion(spark, hadoop, totals, Seq(3L).toDF("id"))
      assert(nessie.loadTableMetadataLocation(orders) == v1Orders)
      assert(nessie.loadTableMetadataLocation(totals) == v1Totals)

      // ONE commit flips both pointers
      nessie.publish(Map(orders -> v2Orders, totals -> v2Totals), "publish v2")
      assert(nessie.commitLog().head.ops.size == 2)
      assert(CatalogIO.readTable(spark, nessie, orders).count() == 3)
      assert(CatalogIO.readTable(spark, nessie, totals)
        .collect().map(_.getLong(0)).toSeq == Seq(3L))

      // the v1 tag still serves the OLD consistent pair of the same tables
      val tagged = new NessieCatalog("v1-view", dir, ref = "v1")
      try {
        assert(CatalogIO.readTable(spark, tagged, orders).count() == 2)
        assert(CatalogIO.readTable(spark, tagged, totals)
          .collect().map(_.getLong(0)).toSeq == Seq(2L))
      } finally tagged.close()

      // re-publishing identical pointers is a no-op (no commit churn)
      val head = nessie.currentHash
      assert(nessie.publish(Map(orders -> v2Orders), "noop") == head)
    } finally { hadoop.close(); nessie.close() }
  }

  test("Spark SQL reads a branch through the DSv2 catalog face") {
    val dir = store()
    val cfg = CatalogConfig("nessie", s"nc${uid()}", Map("store" -> dir))
    seedCanonical(cfg)
    val main = CatalogFactory.build(cfg).asInstanceOf[NessieCatalog]
    try {
      main.createBranch("dev")
      val dev = new NessieCatalog("dev-view", dir, ref = "dev")
      try {
        dev.dropTable(TableRef.parse("foo.tbl2"))
        val catName = s"gnessie${uid()}"
        spark.conf.set(s"spark.sql.catalog.$catName",
          classOf[graft.sources.GraftSparkCatalog].getName)
        spark.conf.set(s"spark.sql.catalog.$catName.type", "nessie")
        spark.conf.set(s"spark.sql.catalog.$catName.store", dir)
        spark.conf.set(s"spark.sql.catalog.$catName.ref", "dev")
        // the SQL session is pinned to the dev branch: tbl2 is gone there,
        // main still serves it through the library face
        assert(spark.sql(s"SHOW TABLES IN $catName.foo").collect()
          .map(_.getString(1)).toSet == Set("tbl1"))
        assert(spark.sql(s"SELECT sum(id) FROM $catName.foo.tbl1")
          .collect().head.getLong(0) == 15L)
        assert(main.tableExists(TableRef.parse("foo.tbl2")))
      } finally dev.close()
    } finally main.close()
  }

  test("cross-branch migrate within one store: main → audit, zero-copy promotion") {
    val dir = store()
    val srcCfg = CatalogConfig("nessie", s"nc${uid()}", Map("store" -> dir))
    seedCanonical(srcCfg)
    val main = CatalogFactory.build(srcCfg).asInstanceOf[NessieCatalog]
    try main.createBranch("audit", fromRef = Some(NessieCatalog.EmptyHash))
    finally main.close()
    // source = main, target = the empty audit branch of the SAME store
    val tgtCfg = srcCfg.copy(name = "audit-view",
      properties = srcCfg.properties + ("ref" -> "audit"))
    val m = new CatalogMigrator(srcCfg, tgtCfg, deleteEntriesFromSourceCatalog = false)
    m.registerTables(spark, m.getMatchingTableIdentifiers(Some("foo\\..*")))
    assert(m.result().registeredTableIdentifiers.size == 2)
    val audit = CatalogFactory.build(tgtCfg)
    try {
      assert(audit.listTables(Namespace.of("foo")).map(_.toString).toSet ==
        Set("foo.tbl1", "foo.tbl2"))
      // bar.* stayed behind; main is untouched by the promotion
      intercept[NoSuchNamespaceException](audit.listTables(Namespace.of("bar")))
    } finally audit.close()
  }
}
