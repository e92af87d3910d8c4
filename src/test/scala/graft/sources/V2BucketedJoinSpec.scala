package graft.sources

import java.nio.file.Files

import graft.TestSpark
import graft.catalog.{CatalogIO, HadoopFsCatalog, TableRef}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins through the DSv2 catalog (the V2 twin of
  * BucketedJoinSpec): tables served by [[GraftSparkCatalog]] whose
  * metadata JSON records a bucket layout must join with NO shuffle
  * exchange — at 100 TB the DSv2 catalog is the front door, and this is
  * what makes its recurring fact-fact joins network-free. */
class V2BucketedJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def withV2Bucketing[A](f: => A): A = {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f
    finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.sources.v2.bucketing.pushPartValues.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  /** Fresh warehouse + catalog registration; returns the catalog name. */
  private def freshCatalog(): (String, HadoopFsCatalog) = {
    val wh = Files.createTempDirectory("v2spj-wh").toString
    val name = s"v2spj${java.util.UUID.randomUUID().toString.take(8).replace("-", "")}"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.type", "hadoop")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    (name, new HadoopFsCatalog(name, wh))
  }

  test("V2 bucketed tables join without a shuffle exchange (KeyGroupedPartitioning)") {
    val (cat, hc) = freshCatalog()
    CatalogIO.createTable(spark, hc, TableRef.parse("db.orders_b"),
      graft.Tables(spark, dir, "orders"),
      bucketBy = Some((8, Seq("o_orderkey"))), sortBy = Seq("o_orderkey"))
    CatalogIO.createTable(spark, hc, TableRef.parse("db.lineitem_b"),
      graft.Tables(spark, dir, "lineitem"),
      bucketBy = Some((8, Seq("l_orderkey"))), sortBy = Seq("l_orderkey"))
    withV2Bucketing {
      val joined = spark.table(s"$cat.db.orders_b")
        .join(spark.table(s"$cat.db.lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("c"))
      val plan = joined.queryExecution.executedPlan.toString
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected a SortMergeJoin in:\n$plan")
      assert(!plan.substring(joinIdx).contains("Exchange hashpartitioning"),
        s"storage-partitioned join still shuffles:\n$plan")

      val direct = graft.Tables(spark, dir, "orders")
        .join(graft.Tables(spark, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("c"))
        .collect().map(_.mkString("|")).sorted.toSeq
      assert(joined.collect().map(_.mkString("|")).sorted.toSeq == direct)
    }
  }

  test("bucketed V2 scan keeps filter pushdown and column pruning") {
    val (cat, hc) = freshCatalog()
    CatalogIO.createTable(spark, hc, TableRef.parse("db.orders_b"),
      graft.Tables(spark, dir, "orders"),
      bucketBy = Some((8, Seq("o_orderkey"))))
    withV2Bucketing {
      val q = spark.table(s"$cat.db.orders_b")
        .filter(col("o_orderkey") === 32L).select("o_orderkey", "o_orderpriority")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters:") && plan.contains("EqualTo(o_orderkey,32"),
        s"filter not pushed through the bucketed scan:\n$plan")
      assert(q.queryExecution.executedPlan.toString.contains("KeyGroupedBuckets"))
      assert(q.collect().nonEmpty)
    }
  }

  test("catalog bucket function matches Spark's bucketed-write hash") {
    // the function SPJ resolves against must be the SAME function that
    // named the bucket files — compare against Spark's own
    // pmod(murmur3_hash, n) on a value sample
    val f = GraftBucketFunction.unbound.bind(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
    import spark.implicits._
    val sample = (Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue) ++
      (1L to 100L).map(_ * 7919L))
    val expected = sample.toDF("k")
      .select(pmod(hash(col("k")), lit(8)).as("b")).collect().map(_.getInt(0))
    val got = sample.map(k =>
      f.produceResult(org.apache.spark.sql.catalyst.InternalRow(8, k)).intValue())
    assert(got == expected.toSeq)
  }

  test("mismatched-but-divisible bucket counts join without a shuffle (ReducibleFunction)") {
    // 8-bucket orders vs 4-bucket lineitem: pmod(h,8) % 4 == pmod(h,4),
    // so the 8-side reduces onto the 4-side and Spark coalesces instead
    // of exchanging — heterogeneous layouts stay co-partitioned at scale
    val (cat, hc) = freshCatalog()
    CatalogIO.createTable(spark, hc, TableRef.parse("db.orders_b8"),
      graft.Tables(spark, dir, "orders"),
      bucketBy = Some((8, Seq("o_orderkey"))))
    CatalogIO.createTable(spark, hc, TableRef.parse("db.lineitem_b4"),
      graft.Tables(spark, dir, "lineitem"),
      bucketBy = Some((4, Seq("l_orderkey"))))
    withV2Bucketing {
      spark.conf.set("spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled", "true")
      try {
        val joined = spark.table(s"$cat.db.orders_b8")
          .join(spark.table(s"$cat.db.lineitem_b4"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("c"))
        val plan = joined.queryExecution.executedPlan.toString
        val joinIdx = plan.indexOf("SortMergeJoin")
        assert(joinIdx >= 0, s"expected a SortMergeJoin in:\n$plan")
        assert(!plan.substring(joinIdx).contains("Exchange hashpartitioning"),
          s"mismatched-bucket SPJ still shuffles:\n$plan")
        val direct = graft.Tables(spark, dir, "orders")
          .join(graft.Tables(spark, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("c"))
          .collect().map(_.mkString("|")).sorted.toSeq
        assert(joined.collect().map(_.mkString("|")).sorted.toSeq == direct)
      } finally
        spark.conf.unset("spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled")
    }
  }

  test("bucketed V2 scan is not capped at bucket count: slice-level parallelism survives") {
    val (cat, hc) = freshCatalog()
    CatalogIO.createTable(spark, hc, TableRef.parse("db.orders_b4"),
      graft.Tables(spark, dir, "orders"),
      bucketBy = Some((4, Seq("o_orderkey"))))
    // force many slices per bucket file; the wrapper must keep them as
    // separate partitions (each tagged with its bucket key), not one
    // giant partition per bucket — at 100 TB one-partition-per-bucket is
    // a multi-TB task
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
    try {
      val df = spark.table(s"$cat.db.orders_b4")
      val scan = df.queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.get.asInstanceOf[BucketedScan]
      val parts = scan.planInputPartitions()
      assert(parts.length > 4, s"parallelism capped at ${parts.length}")
      assert(parts.forall(_.isInstanceOf[
        org.apache.spark.sql.connector.read.HasPartitionKey]))
      assert(df.count() == graft.Tables(spark, dir, "orders").count())
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }

  test("partitioned+bucketed layouts fall back to the plain scan (no false partitioning)") {
    val (cat, hc) = freshCatalog()
    CatalogIO.createTable(spark, hc, TableRef.parse("db.orders_pb"),
      graft.Tables(spark, dir, "orders").withColumn("yr", lit(1995)),
      partitionBy = Seq("yr"), bucketBy = Some((4, Seq("o_orderkey"))))
    withV2Bucketing {
      val t = spark.table(s"$cat.db.orders_pb")
      assert(!t.queryExecution.executedPlan.toString.contains("KeyGroupedBuckets"))
      assert(t.count() == graft.Tables(spark, dir, "orders").count())
    }
  }
}
