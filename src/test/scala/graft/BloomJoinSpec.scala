package graft

import org.apache.spark.sql.functions._

import graft.ops.BloomJoin

/** Bloom-filter join pruning: exact equivalence to the plain join, no false
  * negatives, real row reduction before the shuffle, and the filter sitting
  * in the plan as a codegen-able expression.
  */
class BloomJoinSpec extends SparkSpec {

  private lazy val lineitem = Tables(spark, "/root/testdata/sf0.001", "lineitem")
  private lazy val dim = Tables(spark, "/root/testdata/sf0.001", "supplier")
    .filter(col("s_suppkey") % 10 === 0)

  test("prefiltered join result is identical to the plain join") {
    val plain = lineitem.join(dim, col("l_suppkey") === col("s_suppkey"))
      .select("l_orderkey", "l_linenumber", "s_suppkey")
      .collect().map(_.toSeq).toSet
    val bloomed = BloomJoin
      .prefilteredJoin(lineitem, dim, "l_suppkey", "s_suppkey",
        expectedItems = 1000L, numBits = 65536L)
      .select("l_orderkey", "l_linenumber", "s_suppkey")
      .collect().map(_.toSeq).toSet
    assert(plain.nonEmpty && bloomed === plain)
  }

  test("prefilter keeps every matching row and drops most non-matching ones") {
    val factN = lineitem.count()
    val semiN = lineitem.join(dim, col("l_suppkey") === col("s_suppkey"), "left_semi").count()
    val keptN = BloomJoin.prefilter(lineitem, dim, "l_suppkey", "s_suppkey",
      expectedItems = 1000L, numBits = 65536L).count()
    assert(keptN >= semiN, "a Bloom filter must have no false negatives")
    // dim keeps ~10% of suppliers; false positives should stay far below
    // the pruned mass
    assert(keptN < factN / 2, s"pruning should drop most rows: kept $keptN of $factN")
  }

  test("the bloom probe is a plan expression, not a driver-side loop") {
    val plan = BloomJoin.prefilter(lineitem, dim, "l_suppkey", "s_suppkey",
      expectedItems = 1000L, numBits = 65536L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
  }
}
