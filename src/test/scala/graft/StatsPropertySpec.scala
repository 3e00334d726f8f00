package graft

import graft.ops.Stats
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic properties of the statistical-testing family on random
  * inputs (raw scalacheck generators with fixed seeds):
  *  - Mann–Whitney's doubled U equals the brute-force pair count
  *    2·#(a>b) + #(a=b), and U_A + U_B = n_a·n_b exactly (tie-proof);
  *  - KS is arm-symmetric and equals the brute-force sup over pooled
  *    values;
  *  - Wilcoxon's doubled W+ equals the brute-force midrank sum over
  *    positive differences;
  *  - Spearman is invariant under strictly increasing transforms and
  *    is exactly 1 on (x, x);
  *  - kappa is invariant under label renaming and exactly 1 on
  *    self-agreement;
  *  - Benford rows sum: Σ obs = n and Σ exp_num = n·Σp20.
  */
class StatsPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def longs(seed: Long, count: Int, lo: Long, hi: Long): Seq[Long] = {
    val g = Gen.choose(lo, hi)
    (0 until count).flatMap(i => g(Gen.Parameters.default, Seed(seed + i)))
  }

  test("mannWhitney: doubled U = brute pair count; U_A + U_B = n_a·n_b") {
    for (s <- 1 to 3) {
      val as = longs(10L * s, 15, 0, 6)
      val bs = longs(900L * s, 12, 0, 6)
      val df = (as.map((_, "a")) ++ bs.map((_, "b"))).toDF("v", "arm")
      val r = Stats.mannWhitney(df, Seq(), "v", "arm = 'a'").collect().head
      val brute = (for (a <- as; b <- bs)
        yield (if (a > b) 2L else 0L) + (if (a == b) 1L else 0L)).sum
      assert(r.getAs[Long]("u2_a") === brute,
        s"seed $s: doubled U vs brute pair count")
      // the complement identity: recompute with arms flipped
      val rb = Stats.mannWhitney(df, Seq(), "v", "arm = 'b'").collect().head
      assert(r.getAs[Long]("u2_a") + rb.getAs[Long]("u2_a") ===
        2L * as.size * bs.size, s"seed $s: U_A + U_B = n_a·n_b")
    }
  }

  test("ksTest: arm symmetry and brute-force sup") {
    for (s <- 1 to 3) {
      val as = longs(30L * s, 14, 0, 9)
      val bs = longs(700L * s, 11, 0, 9)
      val df = (as.map((_, "a")) ++ bs.map((_, "b"))).toDF("v", "arm")
      val r1 = Stats.ksTest(df, Seq(), "v", "arm = 'a'").collect().head
      val r2 = Stats.ksTest(df, Seq(), "v", "arm = 'b'").collect().head
      assert(r1.getAs[Long]("ks_num") === r2.getAs[Long]("ks_num"),
        s"seed $s: |F_A − F_B| is arm-symmetric")
      val brute = (as ++ bs).distinct.map { v =>
        math.abs(as.count(_ <= v).toLong * bs.size -
          bs.count(_ <= v).toLong * as.size)
      }.max
      assert(r1.getAs[Long]("ks_num") === brute, s"seed $s: brute sup")
    }
  }

  test("wilcoxon: doubled W+ = brute midrank mass of positive diffs") {
    for (s <- 1 to 3) {
      val xs = longs(50L * s, 16, 0, 5)
      val ys = longs(333L * s, 16, 0, 5)
      val df = xs.zip(ys).toDF("x", "y")
      val r = Stats.wilcoxonSignedRank(df, "x", "y").collect().head
      val d = xs.zip(ys).map { case (x, y) => y - x }.filter(_ != 0L)
      val byAbs = d.map(math.abs).sorted
      def rank2(a: Long): Long = // doubled midrank of |d| = a
        2L * byAbs.count(_ < a) + byAbs.count(_ == a) + 1L
      val brute = d.filter(_ > 0L).map(v => rank2(math.abs(v))).sum
      assert(r.getAs[Long]("w2_pos") === brute, s"seed $s")
      assert(r.getAs[Long]("n_r") === d.size.toLong, s"seed $s")
    }
  }

  test("spearman: monotone-transform invariance; rho(x,x) = 1") {
    for (s <- 1 to 3) {
      val xs = longs(70L * s, 20, 0, 50)
      val ys = longs(990L * s, 20, 0, 50)
      val r1 = Stats.spearman(xs.zip(ys).toDF("x", "y"), "x", "y")
        .collect().head
      val r2 = Stats.spearman(
        xs.map(x => 3L * x + 7L).zip(ys).toDF("x", "y"), "x", "y")
        .collect().head
      // ranks are unchanged by a strictly increasing map — the exact
      // integer pieces must be IDENTICAL, not just close
      assert(r1.getAs[Long]("s_xy") === r2.getAs[Long]("s_xy"), s"seed $s")
      assert(r1.getAs[Long]("s_x") === r2.getAs[Long]("s_x"), s"seed $s")
      if (xs.distinct.size > 1) {
        val self = Stats.spearman(xs.zip(xs).toDF("x", "y"), "x", "y")
          .collect().head
        assert(self.getAs[Long]("s_xy") === self.getAs[Long]("s_x"),
          s"seed $s: rho(x,x) pieces equal → rho = 1")
      }
    }
  }

  test("kappa: self-agreement = 1; invariant under label renaming") {
    for (s <- 1 to 3) {
      val labels = longs(110L * s, 25, 0, 3).map(l => s"l$l")
      val preds = longs(440L * s, 25, 0, 3).map(l => s"l$l")
      val self = Stats.kappa(labels.map(l => (l, l)).toDF("a", "p"), "a", "p")
        .collect().head
      if (labels.distinct.size > 1)
        assert(self.getAs[Double]("kappa") === 1.0, s"seed $s")
      val r1 = Stats.kappa(labels.zip(preds).toDF("a", "p"), "a", "p")
        .collect().head
      val rename = Map("l0" -> "x3", "l1" -> "x2", "l2" -> "x1", "l3" -> "x0")
      val r2 = Stats.kappa(labels.map(rename).zip(preds.map(rename))
        .toDF("a", "p"), "a", "p").collect().head
      assert(r1.getAs[Long]("kappa_num") === r2.getAs[Long]("kappa_num"),
        s"seed $s: kappa is label-name-blind")
      assert(r1.getAs[Long]("kappa_den") === r2.getAs[Long]("kappa_den"),
        s"seed $s")
    }
  }

  test("kruskalWallis: k = 2 reduces to the squared tie-corrected rank-sum z") {
    for (s <- 1 to 3) {
      val as = longs(40L * s, 16, 0, 7)
      val bs = longs(800L * s, 13, 0, 7)
      val df = (as.map((_, "a")) ++ bs.map((_, "b"))).toDF("v", "g")
      val kw = Stats.kruskalWallis(df, "v", "g", Seq("a", "b"))
        .collect().head
      val mw = Stats.mannWhitney(df, Seq(), "v", "g = 'a'").collect().head
      val z = mw.getAs[Double]("z")
      assert(math.abs(kw.getAs[Double]("h_corrected") - z * z) < 1e-9,
        s"seed $s: H(corrected, k=2) must equal z² of the rank-sum test")
    }
  }

  test("cochranQ: k = 2 reduces to McNemar's statistic exactly") {
    for (s <- 1 to 3) {
      val n = 25
      val c1 = longs(50L * s, n, 0, 1).map(_ == 1L)
      val c2 = longs(600L * s, n, 0, 1).map(_ == 1L)
      val rows = (0 until n).flatMap(i =>
        Seq((i.toLong, "t1", c1(i)), (i.toLong, "t2", c2(i))))
        .toDF("item", "t", "s")
      val q = Stats.cochranQ(rows, "item", "t", "s", k = 2).collect().head
      val mc = Stats.mcnemar(
        (0 until n).map(i => (c1(i), c2(i))).toDF("c1", "c2"),
        "c1", "c2").collect().head
      val qNull = q.isNullAt(q.fieldIndex("q"))
      val mNull = mc.isNullAt(mc.fieldIndex("mcnemar"))
      assert(qNull === mNull, s"seed $s: degenerate cases must agree")
      if (!qNull)
        assert(math.abs(q.getAs[Double]("q") -
          mc.getAs[Double]("mcnemar")) < 1e-12,
          s"seed $s: Q(k=2) = (b−c)²/(b+c)")
    }
  }

  test("kendallCells: gamma on a 2×2 table is Yule's Q") {
    for (s <- 1 to 3) {
      val n = 40
      val xs = longs(70L * s, n, 0, 1)
      val ys = longs(500L * s, n, 0, 1)
      val df = xs.zip(ys).toDF("x", "y")
      val r = Stats.kendallCells(df, "x", "y").collect().head
      def cell(a: Long, b: Long): Long =
        xs.zip(ys).count { case (x, y) => x == a && y == b }.toLong
      val (o11, o10, o01, o00) = (cell(1, 1), cell(1, 0), cell(0, 1),
        cell(0, 0))
      val (con, dis) = (o00 * o11, o01 * o10)
      if (con + dis > 0)
        assert(r.getAs[Double]("gamma") ===
          (con - dis).toDouble / (con + dis).toDouble,
          s"seed $s: gamma(2×2) = Yule's Q = (ad−bc)/(ad+bc)")
      else assert(r.isNullAt(r.fieldIndex("gamma")))
    }
  }

  test("permutationTest: p is invariant to conversion-label complement") {
    // |lift| is symmetric under flipping every unit's conversion bit
    // relative to... not in general; instead pin the exact p against a
    // brute-force recount of the same deterministic lifts
    val units = (1L to 80L).map(u => (u, u % 5 == 0))
    val df = units.toDF("u", "c")
    val r = graft.ops.Abtest.permutationTest(df, "u", "c", "ps", rounds = 19)
      .collect().head
    def liftFor(salt: String): Option[Double] = {
      def variant(u: Long): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest((u.toString + salt).getBytes("UTF-8"))
        val hex = md.map("%02x".format(_)).mkString.substring(0, 7)
        java.lang.Long.parseLong(hex, 16) % 2
      }
      val (aU, bU) = units.partition { case (u, _) => variant(u) == 0L }
      if (aU.isEmpty || bU.isEmpty) None
      else Some(bU.count(_._2).toDouble / bU.size -
        aU.count(_._2).toDouble / aU.size)
    }
    val obs = liftFor("ps")
    val ge = (0 until 19).count { i =>
      liftFor(s"ps#$i") match {
        case None => true
        case Some(l) => obs.exists(o => math.abs(l) >= math.abs(o))
      }
    }
    assert(r.getAs[Long]("p_num") === ge.toLong + 1L,
      "p_num must equal the brute-force recount of the null set")
  }

  test("benfordDigits: rows conserve n and total expectation mass") {
    for (s <- 1 to 3) {
      val vs = longs(210L * s, 40, -5, 99999)
      val rows = Stats.benfordDigits(vs.toDF("v"), "v").collect()
      val n = vs.count(_ > 0L).toLong
      assert(rows.map(_.getAs[Long]("obs")).sum === n, s"seed $s")
      assert(rows.map(_.getAs[Long]("exp_num")).sum ===
        n * graft.ops.Stats.Benford20.sum, s"seed $s")
      assert(rows.forall(_.getAs[Long]("n_excluded") ===
        (vs.size - n).toLong), s"seed $s")
    }
  }
}
