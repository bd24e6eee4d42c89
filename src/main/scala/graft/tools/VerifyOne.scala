package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import graft.{GraftSession, SparkEntry}

/** Single-query slice of the Verify dump, for fast local gate
  * iteration: `runMain graft.tools.VerifyOne <sfDir> <outDir> <keys…>`
  * then `python3 tools/check.py <sfDir> <outDir>` compares just those
  * keys (oracle_sql.json is filtered to match).
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val keys = args.drop(2).toSet
    val spark = GraftSession.tune(SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(k => keys(k._1)).foreach { case (name, fn) =>
      fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      spark.catalog.clearCache()
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(k => keys(k._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
