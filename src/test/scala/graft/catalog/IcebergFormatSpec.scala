package graft.catalog

import java.nio.file.Files

import graft.TestSpark
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Native Apache Iceberg v2 interop ([[IcebergFormat]] reader +
  * [[IcebergExport]] writer), implemented from the PUBLIC table spec —
  * no Iceberg jars. The reference's core contract registers a real
  * Iceberg `metadataFileLocation` (CatalogMigrator.java:212-213); these
  * specs prove a genuine metadata.json + avro manifest chain resolves
  * through every engine face: direct reads, SQL through the DSv2
  * catalog, stats pruning from converted manifest bounds, and
  * migration. */
class IcebergFormatSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def uid(): String =
    java.util.UUID.randomUUID().toString.take(8).replace("-", "")

  private def sampleDf = {
    import spark.implicits._
    (1 to 300).map { i =>
      (i.toLong, s"name-$i", i * 1.5,
        java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i % 90)),
        new java.math.BigDecimal(s"$i.25"))
    }.toDF("id", "name", "price", "d", "dec")
      .withColumn("dec", org.apache.spark.sql.functions
        .col("dec").cast("decimal(10,2)"))
  }

  test("export → read round-trip: rows, schema, sizes, stats all survive") {
    val dir = s"${Files.createTempDirectory("graft-iceberg").toString}/t1"
    // 3 files with disjoint id ranges → per-file bounds are meaningful
    val df = sampleDf.repartitionByRange(3, org.apache.spark.sql.functions.col("id"))
    val metaLoc = IcebergExport.writeTable(spark, df, dir)
    assert(metaLoc.endsWith("v1.metadata.json"))

    val layout = CatalogIO.readLayout(metaLoc, spark.sessionState.newHadoopConf())
    assert(layout.dataFiles.exists(_.size == 3))
    assert(layout.dataFileSizes.exists(ss => ss.size == 3 && ss.forall(_ > 0)),
      "file_size_in_bytes must map to manifest sizes")
    assert(layout.schemaDdl.isDefined)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(layout.schemaDdl.get)
    assert(schema.fieldNames.toSeq == Seq("id", "name", "price", "d", "dec"))

    // converted bounds decode through the engine's own stats codec and
    // partition the id domain across the three range-written files
    val decoded = layout.dataFileStats.get.map(FileStats.decode(_, schema))
    assert(decoded.forall(_.isDefined), "every file carries decodable stats")
    val idRanges = decoded.flatMap(_.get.cols.get("id")).map(c =>
      (c.min.get.asInstanceOf[Long], c.max.get.asInstanceOf[Long]))
    assert(idRanges.size == 3 && idRanges.forall { case (mn, mx) => mn <= mx })
    assert(idRanges.map(_._1).min == 1L && idRanges.map(_._2).max == 300L)
    assert(decoded.map(_.get.rowCount).sum == 300L)

    // the scan itself: hash-identical to the parquet contents
    val viaIceberg = CatalogIO.scanMetadataLocation(spark, metaLoc)
    val direct = spark.read.schema(schema).parquet(s"$dir/data")
    assert(viaIceberg.count() == 300)
    assert(viaIceberg.exceptAll(direct).isEmpty && direct.exceptAll(viaIceberg).isEmpty)
  }

  test("a registered Iceberg pointer serves SQL through the DSv2 catalog, stats-pruned") {
    graft.sources.TempCatalog.withTempHandles(spark, "graft-iceberg-sql") { (cat, hc) =>
      val dir = s"${Files.createTempDirectory("graft-iceberg").toString}/t2"
      val df = sampleDf.repartitionByRange(3, org.apache.spark.sql.functions.col("id"))
      val metaLoc = IcebergExport.writeTable(spark, df, dir)
      spark.sql(s"CREATE NAMESPACE $cat.db")
      hc.registerTable(TableRef.parse("db.ice"), metaLoc)
      assert(spark.sql(s"SELECT count(*) c FROM $cat.db.ice").head.getLong(0) == 300)
      // range-partitioned ids + converted bounds: a tight id filter must
      // skip files at PLAN time (the Iceberg manifest's lower/upper
      // bounds driving this engine's StatsPruning)
      graft.sources.StatsPruning.lastPlanned = None
      val n = spark.sql(s"SELECT sum(id) s FROM $cat.db.ice WHERE id <= 50")
        .head.getLong(0)
      assert(n == (1 to 50).map(_.toLong).sum)
      val (skipped, total) = graft.sources.StatsPruning.lastPlanned
        .getOrElse(fail("stats pruning never planned"))
      assert(total == 3 && skipped >= 1,
        s"expected file skipping from Iceberg bounds, got $skipped/$total")
    }
  }

  test("migration copies the pointer; the target catalog serves the same rows") {
    val dir = s"${Files.createTempDirectory("graft-iceberg").toString}/t3"
    val metaLoc = IcebergExport.writeTable(spark, sampleDf.coalesce(1), dir)
    val srcCfg = CatalogConfig("memory", s"ice-src-${uid()}", Map.empty)
    val tgtCfg = CatalogConfig("memory", s"ice-dst-${uid()}", Map.empty)
    val source = CatalogFactory.build(srcCfg)
    source.createNamespace(Namespace.of("db"))
    source.registerTable(TableRef.parse("db.events"), metaLoc)
    val m = new CatalogMigrator(srcCfg, tgtCfg, deleteEntriesFromSourceCatalog = false)
    m.registerTables(spark, m.getMatchingTableIdentifiers(None))
    assert(m.result().registeredTableIdentifiers.map(_.toString) == Seq("db.events"))
    val viaTarget = CatalogIO.readTable(spark, CatalogFactory.build(tgtCfg),
      TableRef.parse("db.events"))
    assert(viaTarget.count() == 300)
  }

  test("live v2 delete manifests refuse loudly (never resurrect rows)") {
    val dir = s"${Files.createTempDirectory("graft-iceberg").toString}/t4"
    val metaLoc = IcebergExport.writeTable(spark, sampleDf.coalesce(1), dir)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(conf)
    // splice a delete manifest into the snapshot: rewrite the manifest
    // list with an extra content=1 entry whose manifest holds one LIVE
    // (status=1) entry — the spec's positional-delete shape
    val metaText = {
      val in = fs.open(new Path(metaLoc))
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    val listPath = """"manifest-list": "([^"]+)"""".r
      .findFirstMatchIn(metaText).get.group(1)
    val delManifest = new Path(dir, "metadata/del-m0.avro")
    val delSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"}]}""".stripMargin)
    val dw = new DataFileWriter(new GenericDatumWriter[GenericRecord](delSchema))
    dw.create(delSchema, fs.create(delManifest, true))
    val rec = new GenericData.Record(delSchema)
    rec.put("status", 1)
    dw.append(rec)
    dw.close()
    // re-write the manifest list: keep the data entry, add the delete one
    val lIn = org.apache.avro.file.DataFileReader.openReader(
      new org.apache.avro.mapred.FsInput(new Path(listPath), conf),
      new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
    val (lSchema, entries) =
      try {
        val b = Vector.newBuilder[GenericRecord]
        while (lIn.hasNext) b += lIn.next()
        (lIn.getSchema, b.result())
      } finally lIn.close()
    fs.delete(new Path(listPath), false)
    val lw = new DataFileWriter(new GenericDatumWriter[GenericRecord](lSchema))
    lw.create(lSchema, fs.create(new Path(listPath), true))
    entries.foreach(lw.append)
    val delEntry = new GenericData.Record(lSchema)
    delEntry.put("manifest_path", fs.makeQualified(delManifest).toString)
    delEntry.put("manifest_length", fs.getFileStatus(delManifest).getLen)
    delEntry.put("partition_spec_id", 0)
    delEntry.put("content", 1)
    delEntry.put("sequence_number", 2L)
    delEntry.put("min_sequence_number", 2L)
    delEntry.put("added_snapshot_id", 1L)
    delEntry.put("added_files_count", 1)
    delEntry.put("existing_files_count", 0)
    delEntry.put("deleted_files_count", 0)
    delEntry.put("added_rows_count", 1L)
    delEntry.put("existing_rows_count", 0L)
    delEntry.put("deleted_rows_count", 0L)
    lw.append(delEntry)
    lw.close()
    val e = intercept[UnsupportedOperationException](
      CatalogIO.readLayout(metaLoc, conf))
    assert(e.getMessage.contains("delete files"))
  }

  test("v1-format metadata: inline manifests, absent optional manifest columns") {
    val dir = s"${Files.createTempDirectory("graft-iceberg").toString}/t5"
    val metaLoc = IcebergExport.writeTable(spark, sampleDf.coalesce(1), dir)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(conf)
    // read the exported (v2-shaped) manifest's entries…
    val m2 = fs.listStatus(new Path(dir, "metadata")).map(_.getPath)
      .find(_.getName.startsWith("m0-")).get
    val rIn = org.apache.avro.file.DataFileReader.openReader(
      new org.apache.avro.mapred.FsInput(m2, conf),
      new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
    val entries = try {
      val b = Vector.newBuilder[GenericRecord]
      while (rIn.hasNext) b += rIn.next()
      b.result()
    } finally rIn.close()
    // …and rewrite them as a V1-SHAPED manifest: no content, no
    // sequence numbers, no bounds — the spec's original field set
    val v1Schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"snapshot_id","type":"long"},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)
    val m1 = new Path(dir, "metadata/v1-manifest.avro")
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](v1Schema))
    w.create(v1Schema, fs.create(m1, true))
    entries.foreach { e =>
      val df2 = e.get("data_file").asInstanceOf[GenericRecord]
      val d = new GenericData.Record(v1Schema.getField("data_file").schema())
      d.put("file_path", df2.get("file_path").toString)
      d.put("file_format", df2.get("file_format").toString)
      d.put("record_count", df2.get("record_count"))
      d.put("file_size_in_bytes", df2.get("file_size_in_bytes"))
      val r = new GenericData.Record(v1Schema)
      r.put("status", 1); r.put("snapshot_id", 7L); r.put("data_file", d)
      w.append(r)
    }
    w.close()
    // v1 metadata: single `schema`, snapshot with INLINE `manifests`
    val v1Meta = new Path(dir, "metadata/v1meta.metadata.json")
    val out = fs.create(v1Meta, true)
    val loc = fs.makeQualified(new Path(dir)).toString
    try out.write(
      s"""{"format-version": 1, "location": "$loc",
         |"schema": {"type": "struct", "fields": [
         |  {"id": 1, "name": "id", "required": true, "type": "long"},
         |  {"id": 2, "name": "name", "required": false, "type": "string"},
         |  {"id": 3, "name": "price", "required": false, "type": "double"},
         |  {"id": 4, "name": "d", "required": false, "type": "date"},
         |  {"id": 5, "name": "dec", "required": false, "type": "decimal(10, 2)"}]},
         |"current-snapshot-id": 7,
         |"snapshots": [{"snapshot-id": 7,
         |  "manifests": ["${fs.makeQualified(m1)}"]}]}""".stripMargin
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val df = CatalogIO.scanMetadataLocation(spark, v1Meta.toString)
    assert(df.count() == 300)
    val layout = CatalogIO.readLayout(v1Meta.toString, conf)
    // no bounds in a v1 fixture: stats degrade to row-count-only text,
    // sizes still present
    assert(layout.dataFileSizes.exists(_.forall(_ > 0)))
    assert(metaLoc.nonEmpty) // v2 twin still reads
  }

  test("snapshot-id time travel reads a historical snapshot from the same metadata") {
    val dir = s"${Files.createTempDirectory("graft-iceberg").toString}/t6"
    val metaLoc = IcebergExport.writeTable(spark,
      sampleDf.repartitionByRange(3, org.apache.spark.sql.functions.col("id")), dir)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(conf)
    val metaText = {
      val in = fs.open(new Path(metaLoc))
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    val curId = """"current-snapshot-id": (\d+)""".r
      .findFirstMatchIn(metaText).get.group(1).toLong
    val listPath = """"manifest-list": "([^"]+)"""".r
      .findFirstMatchIn(metaText).get.group(1)
    // historical snapshot 11: the full manifest minus… nothing — build a
    // 1-entry manifest (the first data file) + its own manifest list
    def readAll(p: Path) = {
      val r = org.apache.avro.file.DataFileReader.openReader(
        new org.apache.avro.mapred.FsInput(p, conf),
        new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      try {
        val b = Vector.newBuilder[GenericRecord]
        while (r.hasNext) b += r.next()
        (r.getSchema, b.result())
      } finally r.close()
    }
    val (lSchema, lEntries) = readAll(new Path(listPath))
    val (mSchema, mEntries) = readAll(
      new Path(lEntries.head.get("manifest_path").toString))
    val firstCount = mEntries.head.get("data_file")
      .asInstanceOf[GenericRecord].get("record_count").asInstanceOf[Long]
    val m1 = new Path(dir, "metadata/hist-m.avro")
    val mw = new DataFileWriter(new GenericDatumWriter[GenericRecord](mSchema))
    mw.create(mSchema, fs.create(m1, true))
    mw.append(mEntries.head)
    mw.close()
    val l1 = new Path(dir, "metadata/snap-11-hist.avro")
    val lw = new DataFileWriter(new GenericDatumWriter[GenericRecord](lSchema))
    lw.create(lSchema, fs.create(l1, true))
    val le = new GenericData.Record(lSchema)
    lSchema.getFields.forEach(f => le.put(f.name, lEntries.head.get(f.name)))
    le.put("manifest_path", fs.makeQualified(m1).toString)
    le.put("manifest_length", fs.getFileStatus(m1).getLen)
    lw.append(le)
    lw.close()
    // splice the historical snapshot into the metadata's snapshot list
    val spliced = metaText.replace("\"snapshots\": [{",
      s"""\"snapshots\": [{
         |    "sequence-number": 1, "snapshot-id": 11,
         |    "timestamp-ms": 0, "summary": {"operation": "append"},
         |    "manifest-list": "${fs.makeQualified(l1)}", "schema-id": 0
         |  }, {""".stripMargin)
    val out = fs.create(new Path(metaLoc), true)
    try out.write(spliced.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // current snapshot unchanged; snapshot 11 serves only the first file
    assert(CatalogIO.scanMetadataLocation(spark, metaLoc).count() == 300)
    assert(CatalogIO.scanIcebergSnapshot(spark, metaLoc, 11L).count() == firstCount)
    assert(CatalogIO.scanIcebergSnapshot(spark, metaLoc, curId).count() == 300)
    val e = intercept[IllegalStateException](
      CatalogIO.scanIcebergSnapshot(spark, metaLoc, 999L))
    assert(e.getMessage.contains("999"))
    // SQL face: VERSION AS OF on a registered Iceberg pointer resolves
    // SNAPSHOT IDS (the id space Iceberg users hold)
    graft.sources.TempCatalog.withTempHandles(spark, "graft-iceberg-tt") { (cat, hc) =>
      spark.sql(s"CREATE NAMESPACE $cat.db")
      hc.registerTable(TableRef.parse("db.ice"), metaLoc)
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.ice").head.getLong(0) == 300)
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.ice VERSION AS OF 11")
        .head.getLong(0) == firstCount)
      val e2 = intercept[Exception](
        spark.sql(s"SELECT count(*) FROM $cat.db.ice VERSION AS OF 999").collect())
      assert(e2.getMessage.contains("999"))
    }
  }

  test("adoption makes a real Iceberg table WRITABLE zero-copy; the source stays readable") {
    graft.sources.TempCatalog.withTempHandles(spark, "graft-iceberg-adopt") { (cat, hc) =>
      val dir = s"${Files.createTempDirectory("graft-iceberg").toString}/t7"
      val metaLoc = IcebergExport.writeTable(spark,
        sampleDf.repartitionByRange(3, org.apache.spark.sql.functions.col("id")), dir)
      spark.sql(s"CREATE NAMESPACE $cat.db")
      val ref = TableRef.parse("db.ad")
      CatalogIO.adoptIcebergTable(spark, hc, ref, metaLoc)
      // v1 = the Iceberg snapshot, zero-copy (same files, stats carried)
      assert(spark.table(s"$cat.db.ad").count() == 300)
      val v1 = CatalogIO.readLayout(hc.loadTableMetadataLocation(ref),
        hc.fileSystem.getConf)
      assert(v1.dataFiles.exists(_.size == 3))
      assert(v1.dataFileStats.exists(_.forall(_.nonEmpty)),
        "converted Iceberg stats must carry into the adopted manifest")
      // the full write surface works from v2 on
      spark.sql(s"INSERT INTO $cat.db.ad SELECT id + 1000, concat('x', id), " +
        "0.5, DATE'2024-06-01', CAST(1.25 AS DECIMAL(10,2)) FROM range(10)")
      assert(spark.table(s"$cat.db.ad").count() == 310)
      import spark.implicits._
      graft.sources.MergeOps.deleteMatchedMergeOnRead(spark, hc, ref,
        Seq(1L, 2L, 3L).toDF("id"), Seq("id"))
      assert(spark.table(s"$cat.db.ad").count() == 307)
      val compacted = CatalogIO.compactTable(spark, hc, ref)
      assert(compacted.compacted)
      assert(spark.table(s"$cat.db.ad").count() == 307)
      // the source Iceberg pointer never sees the divergence
      assert(CatalogIO.scanMetadataLocation(spark, metaLoc).count() == 300)
      // expiry refuses to reclaim the EXTERNAL (adopted-from) data tree
      CatalogIO.expireVersions(hc, ref, keepLast = 1)
      assert(spark.table(s"$cat.db.ad").count() == 307)
      assert(CatalogIO.scanMetadataLocation(spark, metaLoc).count() == 300,
        "expiring adopted-table versions must never destroy the source's data")
    }
  }

  test("unsupported column types and future format versions refuse loudly") {
    val conf = spark.sessionState.newHadoopConf()
    def metaWith(body: String): String = {
      val p = new Path(Files.createTempDirectory("graft-iceberg").toString,
        "vX.metadata.json")
      val fs = p.getFileSystem(conf)
      val out = fs.create(p, true)
      try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      p.toString
    }
    val uuidTable = metaWith(
      """{"format-version": 2, "location": "/tmp/x",
        |"schemas": [{"type": "struct", "schema-id": 0, "fields": [
        |  {"id": 1, "name": "u", "required": false, "type": "uuid"}]}],
        |"current-schema-id": 0, "current-snapshot-id": -1}""".stripMargin)
    val e1 = intercept[UnsupportedOperationException](
      CatalogIO.readLayout(uuidTable, conf))
    assert(e1.getMessage.contains("uuid"))
    val v9 = metaWith("""{"format-version": 9, "location": "/tmp/x"}""")
    val e2 = intercept[UnsupportedOperationException](
      CatalogIO.readLayout(v9, conf))
    assert(e2.getMessage.contains("format-version"))
  }

  test("a snapshotless Iceberg table reads as empty with full schema") {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(Files.createTempDirectory("graft-iceberg").toString,
      "v0.metadata.json")
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(
      """{"format-version": 2, "location": "/tmp/empty-ice",
        |"schemas": [{"type": "struct", "schema-id": 0, "fields": [
        |  {"id": 1, "name": "id", "required": true, "type": "long"},
        |  {"id": 2, "name": "v", "required": false, "type": "string"}]}],
        |"current-schema-id": 0, "current-snapshot-id": -1}""".stripMargin
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val df = CatalogIO.scanMetadataLocation(spark, p.toString)
    assert(df.count() == 0)
    assert(df.schema.fieldNames.toSeq == Seq("id", "v"))
  }
}
