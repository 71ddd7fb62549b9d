package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst GENERATOR (the UDTF tier of the function surface,
  * completing scalar kernels + the typed UDAF): k-word shingles of a text
  * column as one table function —
  * `LATERAL VIEW graft_shingles(text, 3) s AS shingle`.
  *
  * Semantics are EXACTLY [[graft.operators.Dedup.shingleRows]]'s Column
  * composition (split(lower(trim(text)), "\s+"), windows of k,
  * duplicates kept, no shingles when fewer than k words): lowering and
  * trimming go through `UTF8String` — the same code paths Spark's own
  * `lower`/`trim` use — and the split replicates `split`'s limit = -1
  * regex semantics, so the generator is drop-in exchangeable with the
  * composed form and with the DuckDB oracle's string_split_regex CTE.
  *
  * Role: this is the SQL-surface table function. The DataFrame-side
  * operators (`Dedup.shingleRows` and everything on top of it) keep the
  * composed explode form deliberately: it whole-stage-codegens, while a
  * Generator evals through CodegenFallback — measured on d2 at sf0.1 the
  * composed form is ~20% faster, so the interpreted generator stays out
  * of the hot dedup path and serves LATERAL VIEW users.
  */
case class ShingleGen(child: Expression, k: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(k >= 1 && k <= 32, s"shingle size must be in [1, 32], got $k")

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Nil
    // UTF8String lower/trim — bit-identical to Spark's lower(trim(...)).
    val s = raw.asInstanceOf[UTF8String].trim().toLowerCase.toString
    // limit -1 replicates Spark split()'s keep-trailing-empties contract.
    val words = ws.split(s, -1)
    val n = words.length
    if (n < k) return Nil
    val sb = new StringBuilder
    (0 to n - k).map { i =>
      sb.setLength(0)
      var j = i
      while (j < i + k) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      InternalRow(UTF8String.fromString(sb.toString))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGen =
    copy(child = newChild)
}
