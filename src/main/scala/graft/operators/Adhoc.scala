package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoStatement}

/** Parameterized ad-hoc SQL — the reference's prepared-statement
  * surface: its query endpoint binds `$n` placeholders into a prepared
  * statement before running user SQL against the engine
  * (crates/oracle/src/db/weather_data.rs:74-86 `query()`), which is the
  * endpoint a real user hits most.
  *
  * Spark analog: rewrite `$n` to named parameter markers and bind the
  * values through `spark.sql`'s parameter map — values NEVER
  * concatenate into the SQL text, so injection is structurally
  * impossible — plus a read-only guard that rejects any command
  * (DDL/DML), matching the reference endpoint's query-only contract.
  */
object Adhoc {

  /** Rewrite `$n` → `:pn` OUTSIDE string literals: a `$n` inside a
    * string stays literal text, exactly like prepared-statement
    * placeholders, which exist at the statement level, not inside
    * literals. Both quote styles are tracked — Spark's default
    * dialect treats double-quoted text as a string literal too
    * (doubleQuotedIdentifiers is off) — with doubled-quote escapes
    * handled as leave-and-re-enter.
    */
  private[operators] def rewritePlaceholders(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    var quote: Char = 0 // 0 = outside any literal, else the open quote char
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (quote != 0) {
        out.append(c)
        if (c == quote) quote = 0 // '' / "" escape = leave + immediately re-enter
        i += 1
      } else if (c == '\'' || c == '"') {
        out.append(c); quote = c; i += 1
      } else if (c == '$' && i + 1 < sql.length && sql.charAt(i + 1).isDigit) {
        var j = i + 1
        while (j < sql.length && sql.charAt(j).isDigit) j += 1
        out.append(":p").append(sql.substring(i + 1, j))
        i = j
      } else {
        out.append(c); i += 1
      }
    }
    out.toString
  }

  /** Run a read-only SQL statement with `$1..$n` bound to `params`
    * (1-indexed; a placeholder may repeat or appear out of order).
    * Rejects commands — the surface is queries over registered views.
    */
  def query(spark: SparkSession, sql: String, params: Seq[Any]): DataFrame = {
    val rewritten = rewritePlaceholders(sql)
    val writes = spark.sessionState.sqlParser.parsePlan(rewritten).collect {
      case c: Command => c
      case i: InsertIntoStatement => i
    }
    require(writes.isEmpty,
      s"Adhoc.query is read-only; rejected ${writes.head.getClass.getSimpleName}")
    spark.sql(rewritten,
      params.zipWithIndex.map { case (v, i) => s"p${i + 1}" -> v }.toMap)
  }
}
