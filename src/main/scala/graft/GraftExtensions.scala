package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.expr.VectorDot

/** Catalyst integration point: `spark.sql.extensions=graft.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`) registers the engine's
  * native expressions with the SQL function registry, so pure-SQL users
  * get the codegen'd kernels too:
  *
  *   SELECT vector_dot(a.embedding, b.embedding) FROM ...
  *
  * This is the deliberate extension surface — relational operators stay
  * stock Catalyst (SURVEY §4.1: no custom Rule/Strategy is needed for
  * capability parity); only genuinely missing scalar kernels are added.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"vector_dot takes 2 arguments, got ${children.length}")
        VectorDot(children.head, children(1))
      }))
  }
}
