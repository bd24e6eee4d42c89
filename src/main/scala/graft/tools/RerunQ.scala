package graft.tools

/** Executes the given catalog queries N times each in ONE session and
  * compares the collected results across runs — the bench's
  * re-execution shape, isolated (a query with write side effects must
  * be idempotent across in-session reruns; the r14 q128 rerun-only
  * failure is exactly what this catches). Args: [sfDir] [runs] [keys…].
  */
object RerunQ {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val keys = args.drop(2).toSet
    val s = graft.GraftSession.local()
    s.sparkContext.setLogLevel("WARN")
    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(k => keys.isEmpty || keys(k._1)).foreach { case (name, fn) =>
      val results = (1 to runs).map { i =>
        try Right(fn(s, dir).collect().map(_.toSeq).toSeq.sortBy(_.toString))
        catch { case e: Throwable => Left(s"run $i: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(120)}") }
      }
      results.collectFirst { case Left(err) => err } match {
        case Some(err) => bad += 1; println(s"RERUN FAIL $name $err")
        case None =>
          if (results.map(_.toOption.get).distinct.size == 1) println(s"RERUN OK $name")
          else { bad += 1; println(s"RERUN DIVERGED $name") }
      }
      s.catalog.clearCache()
    }
    println(s"RERUN DONE bad=$bad")
    s.stop()
  }
}
