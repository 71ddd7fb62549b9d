package graft

import graft.functions.{CosineSimilarity, QuantizedCosine}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions into the SQL function registry, so
  * `SELECT cosine_similarity(a, b)` works alongside the Column API.
  *
  * Install with `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(
        classOf[CosineSimilarity].getName, null, "cosine_similarity",
        "cosine_similarity(a, b) - cosine similarity of two float arrays",
        "", "", "", "math_funcs", "1.0.0", "", "scala_udf"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "cosine_similarity takes exactly 2 arguments")
        CosineSimilarity(exprs(0), exprs(1))
      },
    ))
    e.injectFunction((
      FunctionIdentifier("quantized_cosine"),
      new ExpressionInfo(
        classOf[QuantizedCosine].getName, null, "quantized_cosine",
        "quantized_cosine(a, b) - engine-portable cosine over 2^20-quantized float arrays",
        "", "", "", "math_funcs", "1.0.0", "", "scala_udf"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "quantized_cosine takes exactly 2 arguments")
        QuantizedCosine(exprs(0), exprs(1))
      },
    ))
  }
}
