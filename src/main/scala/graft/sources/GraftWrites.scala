package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.{CatalogIO, HadoopFsCatalog, TableRef}
import graft.catalog.CatalogIO.TableLayout

/** SQL writes through the DSv2 catalog (round 6): INSERT OVERWRITE /
  * INSERT INTO / CTAS run as VERSIONED catalog commits — every write is
  * `CatalogIO.commitVersion`'s data → metadata → atomic pointer flip, so
  * concurrent readers only ever see complete snapshots and every write
  * extends the time-travel trail (`VERSION AS OF`).
  *
  * Semantics are snapshot-native:
  *  - INSERT OVERWRITE → the new data IS the next version (natural fit);
  *  - INSERT INTO → snapshot-append: current ∪ new becomes the next
  *    version. This rewrites the table — correct, and the honest cost of
  *    appends in a full-snapshot format (the reference's pointer model
  *    has no manifest lists to do better); recurring large-scale appends
  *    belong in partitioned re-creates or [[graft.streaming
  *    .StreamMaterialize]]-style aggregate snapshots;
  *  - CTAS → an empty v1 carrying the schema, then the SELECT commits v2.
  *
  * The recorded physical layout (partition/bucket/sort spec) is applied
  * to every committed version, so a bucketed table stays
  * storage-partitioned-join-ready across writes. Writes require a
  * versioning catalog (HadoopFsCatalog); tables served by
  * memory/rest-backed catalogs stay read-only. */
final class GraftWritableTable(read: Table with SupportsRead,
    cat: HadoopFsCatalog, ref: TableRef, layout: TableLayout)
  extends Table with SupportsRead with SupportsWrite {

  override def name(): String = read.name()
  override def schema(): StructType = read.schema()
  override def properties(): util.Map[String, String] = read.properties()
  override def partitioning(): Array[Transform] = read.partitioning()
  override def capabilities(): util.Set[TableCapability] =
    (read.capabilities().asScala.toSet ++ Set(
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    read.newScanBuilder(options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(cat, ref, layout)
}

private final class GraftWriteBuilder(cat: HadoopFsCatalog, ref: TableRef,
    layout: TableLayout) extends WriteBuilder with SupportsTruncate {

  private var overwrite = false

  override def truncate(): WriteBuilder = { overwrite = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation = new InsertableRelation {
      override def insert(data: Dataset[Row], overwriteFlag: Boolean): Unit = {
        val spark = data.sparkSession
        val replace = overwrite || overwriteFlag
        val next =
          if (replace) data
          else currentRows(spark) match {
            // a just-created (CTAS) or schema-only table has no data
            // files yet — the "append" is the first real snapshot
            case Some(cur) => cur.unionByName(data)
            case None => data
          }
        CatalogIO.commitVersion(spark, cat, ref, next,
          partitionBy = layout.partitionColumns,
          bucketBy = layout.numBuckets.map(n => (n, layout.bucketColumns)),
          sortBy = layout.sortColumns)
        ()
      }
    }
  }

  /** Current committed rows, or None when the current version holds no
    * parquet files (the empty v1 a CTAS/CREATE writes). */
  private def currentRows(spark: SparkSession): Option[DataFrame] = {
    val loc = new org.apache.hadoop.fs.Path(
      CatalogIO.readDataLocation(cat.loadTableMetadataLocation(ref)))
    val fs = loc.getFileSystem(new org.apache.hadoop.conf.Configuration())
    def hasParquet(p: org.apache.hadoop.fs.Path): Boolean =
      fs.exists(p) && fs.listStatus(p).exists { st =>
        (st.isFile && st.getPath.getName.endsWith(".parquet")) ||
          (st.isDirectory && hasParquet(st.getPath))
      }
    if (hasParquet(loc)) Some(spark.read.parquet(loc.toString)) else None
  }
}
