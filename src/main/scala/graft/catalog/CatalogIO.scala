package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data-plane glue between catalogs and Spark.
  *
  * A table's metadata file is a small JSON document recording where the
  * parquet data lives; a catalog entry is a pointer to that file. Reading
  * a table through any catalog resolves pointer → metadata → parquet scan,
  * so after a migration the target catalog serves the same bytes without
  * any data movement (the reference's core invariant,
  * CatalogMigrator.java:212-213).
  */
object CatalogIO {

  private val DataLocRe = """"dataLocation"\s*:\s*"([^"]*)"""".r

  def metadataJson(tableLocation: String, dataLocation: String): String =
    s"""{
       |  "formatVersion": 1,
       |  "location": "$tableLocation",
       |  "dataLocation": "$dataLocation"
       |}
       |""".stripMargin

  /** Create a physical table in a Hadoop warehouse: parquet data +
    * v1 metadata + pointer commit. Returns the metadata-file location. */
  def createTable(spark: SparkSession, cat: HadoopFsCatalog, ref: TableRef,
      df: DataFrame): String = {
    if (cat.tableExists(ref))
      throw new AlreadyExistsException(s"Table already exists: $ref")
    val dir = cat.tableDir(ref)
    val dataDir = new Path(dir, "data")
    df.write.mode("errorifexists").parquet(dataDir.toString)
    val metaDir = new Path(dir, "metadata")
    cat.fileSystem.mkdirs(metaDir)
    val metaFile = new Path(metaDir, "v1.metadata.json")
    cat.writeText(metaFile, metadataJson(dir.toString, dataDir.toString))
    cat.registerTable(ref, metaFile.toString)
    metaFile.toString
  }

  def readDataLocation(metadataLocation: String,
      conf: Configuration = new Configuration()): String = {
    val p = new Path(metadataLocation)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val text = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    DataLocRe.findFirstMatchIn(text)
      .map(_.group(1))
      .getOrElse(throw new IllegalStateException(
        s"No dataLocation in metadata file $metadataLocation"))
  }

  /** Resolve a table through its catalog and scan it. */
  def readTable(spark: SparkSession, cat: Catalog, ref: TableRef): DataFrame =
    spark.read.parquet(readDataLocation(cat.loadTableMetadataLocation(ref)))
}
