package graft.tools
object CountQ {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet; val o = graft.SparkEntry.oracleSql.keySet
    println(s"nq=${q.size} no=${o.size}")
    println("q-o: " + (q -- o).toSeq.sorted.mkString(","))
    println("o-q: " + (o -- q).toSeq.sorted.mkString(","))
  }
}
