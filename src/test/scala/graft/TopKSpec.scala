package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TopK

class TopKSpec extends SparkSpec {

  import spark.implicits._

  /** md5-derived pseudo-random fixture: 600 rows over 7 groups with
    * deliberate value collisions (values quantized to 20 levels).
    */
  private def fixture: DataFrame =
    spark.range(600).select(
      col("id"),
      (col("id") % 7).cast("string").as("g"),
      (Functions.md5Bits(concat(lit("topk:"), col("id").cast("string")), 16) % 20)
        .cast("double").as("v"))

  private def windowTwin(df: DataFrame, k: Int, desc: Boolean): Set[Long] = {
    val ord = if (desc) col("v").desc else col("v").asc
    df.withColumn("_rn",
        row_number().over(Window.partitionBy(col("g"))
          .orderBy(ord, col("id").cast("string"))))
      .filter(col("_rn") <= k)
      .select("id").as[Long].collect().toSet
  }

  test("heap path equals the window formulation, both directions") {
    for (desc <- Seq(true, false); k <- Seq(1, 5, 40)) {
      val got = TopK.groupTopK(fixture, "g", "v", "id", k, descending = desc)
        .select("id").as[Long].collect().toSet
      assert(got == windowTwin(fixture, k, desc), s"desc=$desc k=$k")
    }
  }

  test("partition invariance and k larger than every group") {
    val base = TopK.groupTopK(fixture.repartition(1), "g", "v", "id", 7)
      .select("id").as[Long].collect().toSet
    assert(TopK.groupTopK(fixture.repartition(13), "g", "v", "id", 7)
      .select("id").as[Long].collect().toSet == base)
    val all = TopK.groupTopK(fixture, "g", "v", "id", 1000)
      .select("id").as[Long].collect().toSet
    assert(all == fixture.select("id").as[Long].collect().toSet,
      "k beyond group size returns every row")
  }

  test("null order values and null groups are excluded; keyed-join mode agrees") {
    val df = Seq(
      (1L, "a", Some(5.0)), (2L, "a", None), (3L, null.asInstanceOf[String], Some(9.0)),
      (4L, "a", Some(7.0)), (5L, "b", Some(1.0)))
      .toDF("id", "g", "v")
    val got = TopK.groupTopK(df, "g", "v", "id", 1)
      .select("id").as[Long].collect().toSet
    assert(got == Set(4L, 5L))
    val keyed = TopK.groupTopK(df, "g", "v", "id", 1, broadcastWinners = false)
      .select("id").as[Long].collect().toSet
    assert(keyed == got)
  }

  test("original row payload survives the semi-join untouched") {
    val df = Seq((1L, "a", 5.0, "payload-1"), (2L, "a", 9.0, "payload-2"))
      .toDF("id", "g", "v", "extra")
    val got = TopK.groupTopK(df, "g", "v", "id", 1).collect()
    assert(got.length == 1 && got.head.getString(3) == "payload-2")
  }

  test("no sort of the fact table in the physical plan (heaps do the work)") {
    val plan = TopK.groupTopK(fixture, "g", "v", "id", 3)
      .queryExecution.executedPlan.toString
    // the only Sorts allowed are the window's (local + post-exchange) over
    // the BOUNDED candidate set — both sit above the heap mapPartitions'
    // SerializeFromObject; the fact-side scan feeding the semi-join must
    // not sort, and the semi side must come in broadcast
    val sorts = "Sort \\[".r.findAllIn(plan).size
    assert(sorts <= 2, s"expected only the candidate-window sorts, got $sorts:\n$plan")
    assert(plan.contains("LeftSemi"), s"semi recovery join missing:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"winner set must broadcast into the recovery join:\n$plan")
  }
  test("signed-zero ties resolve like the SQL window (heap must not evict the pick)") {
    import spark.implicits._
    // descending flips signs: 0.0 -> -0.0 and -0.0 -> 0.0; SQL treats them
    // equal so the tiebreak must decide — id "1" (binary-least) wins
    val df = Seq((1L, "a", 0.0), (2L, "a", -0.0)).toDF("id", "g", "v").repartition(1)
    val got = TopK.groupTopK(df, "g", "v", "id", 1)
      .select("id").as[Long].collect().toSet
    assert(got == windowTwin(df, 1, desc = true), s"heap pick $got != window pick")
  }
}
