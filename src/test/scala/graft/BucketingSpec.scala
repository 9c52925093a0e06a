package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join (SURVEY §7 scale design): pre-bucketing
  * both join sides on the key eliminates the shuffle exchange — the
  * plan must contain no Exchange on the bucketed join. */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("bucketed tables join without a shuffle exchange") {
    val d = "/root/testdata/sf0.001"
    Tables.orders(spark, d).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
    Tables.lineitem(spark, d).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        spark.table("lineitem_b")("l_orderkey") === spark.table("orders_b")("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle, plan was:\n$plan")
    // and it still computes the right thing
    assert(joined.count() == Tables.lineitem(spark, d).count())
  }
}
