package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions.expr.{MisraGries, ShingleHashes, SimHash48, VectorDot}

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
    // custom-operator path (c): the AS-OF temporal join planner strategy
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"vector_dot takes 2 arguments, got ${children.length}")
        VectorDot(children.head, children(1))
      }))

    def intLit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }

    // simhash48(tokens array<string>) -> 48-bit signature
    ext.injectFunction((
      new FunctionIdentifier("simhash48"),
      new ExpressionInfo(classOf[SimHash48].getName, "simhash48"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"simhash48 takes 1 argument, got ${children.length}")
        SimHash48(children.head)
      }))

    // mg_summary(item string, capacity) -> Misra-Gries heavy-hitter
    // summary: array<struct<item,cnt>> sorted (cnt desc, item asc)
    ext.injectFunction((
      new FunctionIdentifier("mg_summary"),
      new ExpressionInfo(classOf[MisraGries].getName, "mg_summary"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"mg_summary takes 2 arguments (item, capacity), got ${children.length}")
        MisraGries(children.head, intLit(children(1), "capacity"))
      }))

    // shingle_hashes(tokens array<string>, n, hexLen) -> distinct hash set
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"shingle_hashes takes 3 arguments (tokens, n, hexLen), got ${children.length}")
        ShingleHashes(children.head,
          intLit(children(1), "n"), intLit(children(2), "hexLen"))
      }))
  }
}
