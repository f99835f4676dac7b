package graft.ops

import org.apache.spark.sql.SparkSession

/** Shared sidecar-metadata helper for persisted indexes: a tiny JSON file of
  * integer fields written next to the data so a later load VALIDATES the
  * geometry (planes/dims/m/k/…) instead of guessing it — used by the LSH
  * index, the PQ codebooks, and any future persisted structure. One
  * implementation so escaping/missing-field behavior can't drift between
  * copies.
  */
private[graft] object MetaJson {

  def write(spark: SparkSession, dir: String, file: String, fields: Seq[(String, Long)]): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val body = fields.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val out = fs.create(p, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read the named integer fields; `what` names the structure in errors
    * (e.g. "an index written by saveLshIndex").
    */
  def readFields(
      spark: SparkSession, dir: String, file: String,
      names: Seq[String], what: String): Map[String, Int] = {
    val p = new org.apache.hadoop.fs.Path(dir, file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"$dir has no $file — not $what; refusing to guess its geometry")
    val in = fs.open(p)
    val json =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    names.map { k =>
      val m = (s""""$k"\\s*:\\s*(\\d+)""").r.findFirstMatchIn(json)
      require(m.isDefined, s"$file at $dir is missing field $k: $json")
      k -> m.get.group(1).toInt
    }.toMap
  }
}
