package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** Bucketed interval join: exactness regardless of bucket width (an
  * interval exploded onto many cells must not duplicate matches — each
  * point lives in exactly one cell). */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(points: Seq[(Long, Long)], ivs: Seq[(Long, Long, Long)]) =
    (for {
      (pk, pt) <- points
      (ik, s, e) <- ivs
      if pk == ik && pt >= s && pt <= e
    } yield (ik, s, e, pk, pt)).sortBy(x => (x._1, x._2, x._5))

  test("matches brute force for wide and narrow bucket widths") {
    val pts = Seq((1L, 5L), (1L, 42L), (1L, 99L), (2L, 10L), (3L, 7L))
    val ivs = Seq((1L, 0L, 50L), (1L, 40L, 45L), (2L, 11L, 20L), (3L, 7L, 7L))
    val pdf = pts.toDF("pk", "pt")
    val idf = ivs.toDF("ik", "s", "e")
    for (width <- Seq(1L, 7L, 100L)) {
      val out = RangeJoin.bucketedInterval(pdf, idf,
          Seq("pk"), Seq("ik"), pdf("pt"), idf("s"), idf("e"), width)
        .select(col("ik"), col("s"), col("e"), col("pk"), col("pt"))
        .as[(Long, Long, Long, Long, Long)].collect()
        .sortBy(x => (x._1, x._2, x._5))
      assert(out.toSeq === brute(pts, ivs), s"width=$width")
    }
  }
}
