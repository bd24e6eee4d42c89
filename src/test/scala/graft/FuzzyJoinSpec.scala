package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** fuzzyJoin1's pigeonhole candidate rule must lose NO pair within
  * edit distance 1 — brute-force parity on randomized corpora where
  * the edits include substitutions, insertions, AND deletions (the
  * oracle gate covers substitution/deletion on real titles; inserts
  * exercise the |s| = |t|+1 probe lengths).
  */
class FuzzyJoinSpec extends SparkSpecBase {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("fuzzyJoin1 equals brute force incl. insert/delete/substitute edits") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(11)
    def word(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(4)).toChar).mkString
    val rights = (1L to 60L).map(i => (i, word(4 + rnd.nextInt(6))))
    val lefts = (1L to 120L).map { i =>
      val (_, base) = rights(rnd.nextInt(rights.size))
      val p = rnd.nextInt(base.length)
      val s = rnd.nextInt(4) match {
        case 0 => base.updated(p, 'z')                           // substitute
        case 1 => base.substring(0, p) + base.substring(p + 1)   // delete
        case 2 => base.substring(0, p) + "z" + base.substring(p) // insert
        case _ => base                                           // verbatim
      }
      (1000L + i, s)
    }
    val got = Dedup.fuzzyJoin1(
        lefts.toDF("l_id", "l_s"), col("l_id"), col("l_s"),
        rights.toDF("r_id", "r_s"), col("r_id"), col("r_s"))
      .as[(Long, Long, Long)].collect().toSet
    val want = (for {
      (li, ls) <- lefts
      (ri, rs) <- rights
      d = lev(ls, rs) if d <= 1
    } yield (li, ri, d.toLong)).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty)
  }
}
