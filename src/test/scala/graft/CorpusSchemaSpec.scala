package graft

import org.apache.spark.sql.types._

/** Corpus-contract pins beyond the events envelope (EventsSchemaSpec):
  * the documents/embeddings loaders and the query registry itself. The
  * r6 round lost 20 queries to a silent testdata re-encode of ONE
  * column; these assertions turn the same class of drift on the other
  * tables — and a queries/oracle registration slip — into test
  * failures instead of driver-round surprises. */
class CorpusSchemaSpec extends SparkTestBase {
  import graft.core.Tables

  test("documents: id/text/lang/source columns with stable types") {
    val s = Tables.documents(spark, sf0001).schema
    assert(s("doc_id").dataType == LongType)
    assert(s("text").dataType == StringType)
    assert(s("lang").dataType == StringType)
    assert(s("source").dataType == StringType)
    assert(s("n_chars").dataType == LongType)
  }

  test("embeddings: vec_id + float-array embedding (64-dim) + label") {
    val s = Tables.embeddings(spark, sf0001).schema
    assert(s("vec_id").dataType == LongType)
    assert(s("embedding").dataType == ArrayType(FloatType, containsNull = true) ||
      s("embedding").dataType == ArrayType(FloatType, containsNull = false),
      s"embedding must stay Array[Float] (int8/PQ paths quantize from it), got ${s("embedding").dataType}")
    val dim = Tables.embeddings(spark, sf0001)
      .selectExpr("size(embedding)").head().getInt(0)
    assert(dim == 64, s"embedding dim drifted: $dim (Ann/Pq call sites pass dim = 64)")
  }

  test("every query has an oracle and every oracle has a query; names unique") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert((qs -- os).isEmpty, s"queries without oracle SQL: ${(qs -- os).toSeq.sorted}")
    assert((os -- qs).isEmpty, s"oracle SQL without a query: ${(os -- qs).toSeq.sorted}")
    val names = graft.queries.Queries.all.map(_._1)
    assert(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct}")
  }
}
