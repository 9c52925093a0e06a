package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Similarity-operator invariants not expressible as DuckDB oracles:
  * k-means-update determinism under repartitioning (the exact-integer
  * micro-mean claim), centroid self-assignment, and the banded-LSH
  * near-dup pair contract vs the brute-force N^2 oracle (perfect
  * precision — exact re-rank — plus a recall floor on the fixture). */
class SimilaritySpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.CassFunctions.registerAll(s)
    s
  }

  test("kmeansUpdate is partition-count independent (order-insensitive integer sums)") {
    val emb = Tables.embeddings(spark, sfDir)
    val one = Similarity.kmeansUpdate(emb.repartition(1), 8).collect().toSet
    val many = Similarity.kmeansUpdate(emb.repartition(7), 8).collect().toSet
    assert(one == many)
    assert(one.nonEmpty)
  }

  test("every centroid vector assigns to itself (cos=1 is its own argmax)") {
    val asg = Similarity.assignCentroids(Tables.embeddings(spark, sfDir), 8)
      .selectExpr("vec_id", "centroid")
      .filter("vec_id < 8")
      .collect()
    assert(asg.length == 8)
    asg.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("member counts partition the corpus exactly") {
    val emb = Tables.embeddings(spark, sfDir)
    val total = emb.count()
    val perCluster = Similarity.kmeansUpdate(emb, 8)
      .filter("dim = 1").selectExpr("sum(n_members)").collect()(0).getLong(0)
    assert(perCluster == total)
  }

  test("banded near-dup pairs: perfect precision, bounded recall loss vs brute force") {
    val emb = Tables.embeddings(spark, sfDir)
    val banded = Similarity.nearDupPairs(emb, 0.95)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.nearDupPairsBrute(emb, 0.95)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded.subsetOf(brute), "exact re-rank must never emit a false pair")
    if (brute.nonEmpty) {
      val recall = banded.size.toDouble / brute.size
      assert(recall >= 0.5, s"LSH recall degraded: $recall (${banded.size}/${brute.size})")
    }
  }
}
