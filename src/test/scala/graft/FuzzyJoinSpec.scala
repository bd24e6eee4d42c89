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

  test("collapseDuplicates: weight-carrying distinct equals brute on a duplicated corpus") {
    val sp = spark
    import sp.implicits._
    // boilerplate regime: every string occurs under several ids on BOTH
    // sides — the collapse path must expand verified string pairs back
    // to ALL id pairs, exactly
    val rnd = new scala.util.Random(13)
    def word(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(4)).toChar).mkString
    val bases = (0 until 20).map(_ => word(5 + rnd.nextInt(4)))
    val rights = (0L until 80L).map(i => (i, bases((i % 20).toInt)))
    val lefts = (0L until 80L).map { i =>
      val base = bases(rnd.nextInt(bases.size))
      val p = rnd.nextInt(base.length)
      val s = rnd.nextInt(3) match {
        case 0 => base.updated(p, 'z')
        case 1 => base.substring(0, p) + base.substring(p + 1)
        case _ => base
      }
      (1000L + i, s)
    }
    val want = (for { (li, ls) <- lefts; (ri, rs) <- rights; d = lev(ls, rs) if d <= 1 }
      yield (li, ri, d.toLong)).toSet
    val got = Dedup.fuzzyJoin1(
        lefts.toDF("l_id", "l_s"), col("l_id"), col("l_s"),
        rights.toDF("r_id", "r_s"), col("r_id"), col("r_s"),
        collapseDuplicates = true)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.size > rights.size, "duplication must make pairs outnumber distinct strings")
  }

  test("collapseDuplicates: multiset inputs (repeated (id, string) rows) match the core path") {
    val sp = spark
    import sp.implicits._
    // ADVICE r11: the core path ends in a distinct on (l_id, r_id, dist)
    // but the collapse branch's expansion joins used to multiply any
    // repeated input row — the two modes must agree on multisets
    val lefts = Seq((1L, "abcde"), (1L, "abcde"), (2L, "abcdz"), (2L, "abcdz"), (2L, "abcdz"))
    val rights = Seq((10L, "abcde"), (10L, "abcde"), (11L, "abcd"))
    def run(collapse: Boolean) = Dedup.fuzzyJoin1(
        lefts.toDF("l_id", "l_s"), col("l_id"), col("l_s"),
        rights.toDF("r_id", "r_s"), col("r_id"), col("r_s"),
        collapseDuplicates = collapse)
      .as[(Long, Long, Long)].collect()
    val core = run(false); val collapsed = run(true)
    assert(core.length == core.toSet.size, "core path must emit each pair once")
    assert(collapsed.length == collapsed.toSet.size, "collapse path must emit each pair once")
    assert(collapsed.toSet == core.toSet, "modes must agree on multiset inputs")
  }

  test("hot-bucket salt: planted constant-prefix corpus, brute parity + bounded cells") {
    val sp = spark
    import sp.implicits._
    // the degenerate PassJoin input: serial names sharing one long
    // constant prefix at ONE length, so every P-probe lands in a
    // single (kind, key) bucket (the PLANS.md 664k-candidate shape)
    val rights = (0L until 400L).map(i => (i, f"Supplier#${i}%06d"))
    val lefts = (0L until 400L).map { i =>
      val base = f"Supplier#${i % 200}%06d"
      val s = if (i % 3 == 0) base.dropRight(1) + "z" else base // tail substitute / verbatim
      (10000L + i, s)
    }
    val lDf = lefts.toDF("l_id", "l_s"); val rDf = rights.toDF("r_id", "r_s")
    val want = (for { (li, ls) <- lefts; (ri, rs) <- rights; d = lev(ls, rs) if d <= 1 }
      yield (li, ri, d.toLong)).toSet
    // salted (hot threshold well below the planted bucket) == unsalted == brute
    val salted = Dedup.fuzzyJoin1(lDf, col("l_id"), col("l_s"),
        rDf, col("r_id"), col("r_s"), salts = 8, hotThreshold = 50L)
      .as[(Long, Long, Long)].collect().toSet
    val unsalted = Dedup.fuzzyJoin1(lDf, col("l_id"), col("l_s"),
        rDf, col("r_id"), col("r_s"), salts = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(salted == want, s"salted missing=${(want -- salted).take(5)} extra=${(salted -- want).take(5)}")
    assert(unsalted == want)
    assert(want.nonEmpty)
    // the planted corpus IS degenerate: every same-length P-probe
    // shares one bucket key, far above the salt threshold...
    val pKey = lDf.select(substring(col("l_s"), 1, 8).as("k")) // 16-char names, half = 8
      .groupBy("k").count().as[(String, Long)].collect().toMap
    assert(pKey.values.max >= 400L)
    // ...and the salt bounds each joined cell: left rows of the hot
    // bucket spread by xxhash64(l_id) % 8, so no (key, salt) cell
    // keeps more than a ~2x-of-fair share of the 400 rows
    val cells = lDf.select(pmod(xxhash64(col("l_id")), lit(8)).as("s"))
      .groupBy("s").count().as[(Long, Long)].collect().toMap
    assert(cells.size == 8 && cells.values.max <= 2 * 400 / 8,
      s"salt cells uneven: $cells")
  }
}
