package graft.cli

import java.nio.file.Files

import graft.TestSpark
import graft.catalog._
import org.scalatest.funsuite.AnyFunSuite

/** CLI end-to-end parity (reference AbstractCLIMigrationTest,
  * CLIOptionsTest, ProcessIdentifiersTest, ITHadoopToNessie volume test):
  * console wording, output files, exit codes, prompt, dry-run round-trip,
  * 100-batch progress lines.
  */
class CLISpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark // keeps an active session for the CLI
  private def uid(): String = java.util.UUID.randomUUID().toString.take(8)

  private def runCli(args: Seq[String], answers: List[String] = Nil): (Int, Seq[String]) = {
    spark // force session init so the CLI reuses it
    val lines = collection.mutable.ArrayBuffer.empty[String]
    var remaining = answers
    val code = CatalogMigrationCLI.run(args,
      readLine = () => remaining match {
        case h :: t => remaining = t; h
        case Nil => "no"
      },
      out = l => lines += l)
    (code, lines.toSeq)
  }

  private def seedMemory(n: Int = 4): (CatalogConfig, CatalogConfig) = {
    val srcCfg = CatalogConfig("memory", s"mem-src-${uid()}")
    val tgtCfg = CatalogConfig("memory", s"mem-tgt-${uid()}")
    val src = CatalogFactory.build(srcCfg)
    src.createNamespace(Namespace.of("foo"))
    src.createNamespace(Namespace.of("bar"))
    Seq("foo.tbl1", "foo.tbl2", "bar.tbl3", "bar.tbl4").take(n).foreach(id =>
      src.registerTable(TableRef.parse(id), s"file:///fake/$id/v1.metadata.json"))
    (srcCfg, tgtCfg)
  }

  private def catArgs(src: CatalogConfig, tgt: CatalogConfig, outDir: String) = Seq(
    "--source-catalog-type", "memory",
    "--source-catalog-properties", s"name=${src.name}",
    "--target-catalog-type", "memory",
    "--target-catalog-properties", s"name=${tgt.name}",
    "--output-dir", outDir)

  // memory catalogs resolve by CatalogConfig.name — wire it through a prop
  private def cfgByName(props: CatalogConfig): CatalogConfig = props

  test("migrate end-to-end: wording, exit 0, source entries deleted") {
    val (srcCfg, tgtCfg) = seedMemory()
    val out = Files.createTempDirectory("cli-out").toString
    val (code, lines) = runCli(
      Seq("migrate") ++ catArgs(srcCfg, tgtCfg, out) :+ "--disable-safety-prompts")
    assert(code == 0, lines.mkString("\n"))
    assert(lines.exists(_.contains("Identified 4 tables for migration.")))
    assert(lines.exists(_.contains(
      "Successfully migrated 4 tables from MEMORY catalog to MEMORY catalog.")))
    assert(lines.exists(_.startsWith("Details: ")))
    val src = CatalogFactory.build(srcCfg)
    val tgt = CatalogFactory.build(tgtCfg)
    assert(!src.tableExists(TableRef.parse("foo.tbl1")))
    assert(tgt.tableExists(TableRef.parse("bar.tbl4")))
  }

  test("dry-run writes dry_run_identifiers.txt usable via --identifiers-from-file") {
    val (srcCfg, tgtCfg) = seedMemory()
    val out = Files.createTempDirectory("cli-out")
    val (code, lines) = runCli(Seq("migrate") ++ catArgs(srcCfg, tgtCfg, out.toString)
      :+ "--dry-run")
    assert(code == 0)
    assert(lines.exists(_.contains("Dry run is completed.")))
    assert(lines.exists(_.contains("Identified 4 tables for migration by dry-run.")))
    val f = out.resolve("dry_run_identifiers.txt")
    assert(Files.readAllLines(f).size() == 4)
    // round-trip: use the file for the actual run (reference :366-388)
    val (code2, lines2) = runCli(Seq("migrate") ++ catArgs(srcCfg, tgtCfg, out.toString)
      ++ Seq("--identifiers-from-file", f.toString, "--disable-safety-prompts"))
    assert(code2 == 0, lines2.mkString("\n"))
    assert(lines2.exists(_.contains("Successfully migrated 4 tables")))
  }

  test("failed identifiers are reported, written, and exit code is 1") {
    val (srcCfg, tgtCfg) = seedMemory()
    val out = Files.createTempDirectory("cli-out")
    val (code, lines) = runCli(Seq("register") ++ catArgs(srcCfg, tgtCfg, out.toString)
      ++ Seq("--identifiers", "foo.tbl1,dummy.tblx", "--disable-safety-prompts"))
    assert(code == 1)
    assert(lines.exists(_.contains("Successfully registered 1 tables")))
    assert(lines.exists(_.contains("Failed to register 1 tables")))
    val failed = Files.readAllLines(out.resolve("failed_identifiers.txt"))
    assert(failed.size() == 1 && failed.get(0) == "dummy.tblx")
    // R22: the engine's failure REASON (slf4j line) must be in the file
    // the summary tells users to check, not just the CLI console mirror
    val logText = Files.readString(out.resolve("catalog_migration.log"))
    assert(logText.contains("Unable to register the table dummy.tblx"), logText)
  }

  test("prompt: 'no' aborts with exit 1; invalid input reprompts; 'yes' proceeds") {
    val (srcCfg, tgtCfg) = seedMemory()
    val out = Files.createTempDirectory("cli-out").toString
    val (code, lines) = runCli(Seq("migrate") ++ catArgs(srcCfg, tgtCfg, out),
      answers = List("maybe", "no"))
    assert(code == 1)
    assert(lines.exists(_.contains("Invalid input. Please enter 'yes' or 'no'.")))
    assert(lines.exists(_.contains("Aborting...")))
    val (code2, lines2) = runCli(Seq("migrate") ++ catArgs(srcCfg, tgtCfg, out),
      answers = List("yes"))
    assert(code2 == 0)
    assert(lines2.exists(_.contains("Continuing...")))
  }

  test("argument errors exit 2: unknown option, mutually-exclusive identifier options") {
    val (code, _) = runCli(Seq("migrate", "--bogus"))
    assert(code == 2)
    val (code2, lines2) = runCli(Seq("migrate",
      "--source-catalog-type", "memory", "--target-catalog-type", "memory",
      "--identifiers", "a.b", "--identifiers-regex", "x.*"))
    assert(code2 == 2)
    assert(lines2.exists(_.contains("mutually exclusive")))
    val (code3, _) = runCli(Seq("frobnicate"))
    assert(code3 == 2)
    // malformed --*-catalog-properties entry (no '=') is an argument
    // error, not a MatchError crash
    val (code4, lines4) = runCli(Seq("migrate",
      "--source-catalog-type", "memory",
      "--source-catalog-properties", "warehouse",
      "--target-catalog-type", "memory"))
    assert(code4 == 2)
    assert(lines4.exists(_.contains("Malformed catalog property")))
  }

  test("repeatable properties accumulate; hadoop-conf and custom impl flags parse") {
    // repeated --source-catalog-properties merge; hadoop-conf overlays the
    // FS config (benign key here); register run over hadoop catalogs
    val wh1 = Files.createTempDirectory("cli-src").toString
    val wh2 = Files.createTempDirectory("cli-tgt").toString
    val out = Files.createTempDirectory("cli-out").toString
    val spark = graft.TestSpark.spark
    val src = new graft.catalog.HadoopFsCatalog("s", wh1)
    import spark.implicits._
    graft.catalog.CatalogIO.createTable(spark, src,
      graft.catalog.TableRef.parse("foo.t1"), Seq((1L, "x")).toDF("id", "v"))
    val (code, lines) = runCli(Seq("register",
      "--source-catalog-type", "hadoop",
      "--source-catalog-properties", s"warehouse=$wh1",
      "--source-catalog-properties", "extra=1",
      "--source-catalog-hadoop-conf", "io.file.buffer.size=8192",
      "--target-catalog-type", "hadoop",
      "--target-catalog-properties", s"warehouse=$wh2",
      "--output-dir", out, "--disable-safety-prompts"))
    assert(code == 0, lines.mkString("\n"))
    assert(lines.exists(_.contains("Summary")))
    // custom impl flag maps to the reflective factory path
    val (code2, lines2) = runCli(Seq("register",
      "--source-catalog-type", "custom",
      "--source-custom-catalog-impl", "does.not.Exist",
      "--target-catalog-type", "memory",
      "--output-dir", out, "--disable-safety-prompts"))
    assert(code2 == 1)
    assert(lines2.exists(_.contains("Error")))
  }

  test("runtime errors exit 1: bad regex, missing identifiers file, empty source") {
    val (srcCfg, tgtCfg) = seedMemory(0)
    val out = Files.createTempDirectory("cli-out").toString
    val (code, lines) = runCli(Seq("migrate") ++ catArgs(srcCfg, tgtCfg, out)
      ++ Seq("--identifiers-regex", "(23erf423!", "--disable-safety-prompts"))
    assert(code == 1)
    assert(lines.exists(_.contains("not compilable")))
    val (code2, lines2) = runCli(Seq("migrate") ++ catArgs(srcCfg, tgtCfg, out)
      ++ Seq("--identifiers-from-file", "/nonexistent/ids.txt"))
    assert(code2 == 1)
    assert(lines2.exists(_.contains("does not exist")))
    val (code3, lines3) = runCli(Seq("migrate") ++ catArgs(srcCfg, tgtCfg, out)
      :+ "--disable-safety-prompts")
    assert(code3 == 1)
    assert(lines3.exists(_.contains("No tables were identified for migration.")))
  }

  test("hadoop source rejected for migrate with reference message, allowed for register") {
    val wh = Files.createTempDirectory("cli-wh").toString
    val tgtCfg = CatalogConfig("memory", s"mem-tgt-${uid()}")
    val out = Files.createTempDirectory("cli-out").toString
    val (code, lines) = runCli(Seq("migrate",
      "--source-catalog-type", "hadoop", "--source-catalog-properties", s"warehouse=$wh",
      "--target-catalog-type", "memory", "--target-catalog-properties", s"name=${tgtCfg.name}",
      "--output-dir", out, "--disable-safety-prompts"))
    assert(code == 1)
    assert(lines.exists(_.contains("Please use 'register' command instead.")))
  }

  test("244-table volume: progress lines at 100/200/244 (ITHadoopToNessieCLI :38-96)") {
    val srcCfg = CatalogConfig("memory", s"mem-src-${uid()}")
    val tgtCfg = CatalogConfig("memory", s"mem-tgt-${uid()}")
    val src = CatalogFactory.build(srcCfg)
    src.createNamespace(Namespace.of("foo"))
    (0 until 244).foreach(i =>
      src.registerTable(TableRef.parse(s"foo.tblx$i"), s"file:///fake/$i.metadata.json"))
    val out = Files.createTempDirectory("cli-out").toString
    val (code, lines) = runCli(Seq("migrate") ++ catArgs(srcCfg, tgtCfg, out)
      :+ "--disable-safety-prompts")
    assert(code == 0, lines.mkString("\n"))
    assert(lines.exists(_.contains("Attempted migration for 100 tables out of 244 tables.")))
    assert(lines.exists(_.contains("Attempted migration for 200 tables out of 244 tables.")))
    assert(lines.exists(_.contains("Attempted migration for 244 tables out of 244 tables.")))
    assert(lines.exists(_.contains("Successfully migrated 244 tables")))
  }

  test("--version reflects build metadata (not a hardcoded string); --help exits 0") {
    val (code, lines) = runCli(Seq("--version"))
    assert(code == 0)
    // the version resource is generated by sbt from build.sbt's version —
    // a missing resource would surface here as "unknown"
    assert(BuildInfo.version != "unknown")
    assert(lines == Seq(s"catalog-migrator ${BuildInfo.version}"))
    assert(runCli(Seq("--help"))._1 == 0)
    assert(runCli(Seq.empty)._1 == 2)
  }
}
