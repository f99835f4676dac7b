package graft
import org.apache.spark.sql.functions._
object DebugRouge {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import spark.implicits._
    val df = Seq((0L, "a1 b2 c3 d4 e5 f6 g7"), (2L, "x y z")).toDF("doc_id", "text")
    val toks = filter(split(trim(lower(col("text"))), "\\s+"), t => t =!= "")
    val ref = when(col("doc_id") % 3 === 0,
        concat_ws(" ", transform(toks,
          (t, i) => when((i + 1) % 3 === 0, lit("")).otherwise(t))))
      .otherwise(concat(col("text"), lit(" "),
        concat_ws(" ", slice(toks, lit(1), lit(10)))))
    val out = df.select(col("doc_id"), ref.as("ref"))
    out.collect().foreach(r => println(s"id=${r.getLong(0)} ref='${r.getString(1)}'"))
    val rouge = ops.RankEval.rougeL(
      df.select(col("doc_id").as("id"), col("text").as("cand"), ref.as("ref")), "id", "cand", "ref")
    rouge.show(false)
    spark.stop()
  }
}
