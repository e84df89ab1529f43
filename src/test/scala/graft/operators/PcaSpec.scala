package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // independent plain-Scala replay of the full pipeline (quantize →
  // moments → scatter → rescale → power rounds → projection)
  private def reference(vecs: Seq[(Long, Seq[Float])],
      rounds: Int): (Seq[Long], Map[Long, Long]) = {
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 10000 + 0.5).toLong)
    }
    val dim = q.head._2.size
    val n = q.size.toLong
    val s = (0 until dim).map(i => q.map(_._2(i)).sum)
    val m = Array.tabulate(dim, dim)((i, j) =>
      q.map(r => r._2(i) * r._2(j)).sum)
    val scatter = Array.tabulate(dim, dim)((i, j) =>
      n * m(i)(j) - s(i) * s(j))
    val mx = scatter.flatten.map(math.abs).max
    val a = scatter.map(_.map(c =>
      if (mx == 0L) 0L
      else math.floor(c.toDouble * 1000000.0 / mx + 0.5).toLong))
    var v = Seq.fill(dim)(1000000L)
    for (_ <- 1 to rounds) {
      val w = (0 until dim).map(i =>
        (0 until dim).map(j => a(i)(j) * v(j)).sum)
      val mw = w.map(math.abs).max
      v = w.map(x => if (mw == 0L) x
        else math.floor(x.toDouble * 1000000.0 / mw + 0.5).toLong)
    }
    val pc = v
    (pc, q.map { case (id, qv) =>
      id -> (0 until dim).map(i => qv(i) * pc(i)).sum
    }.toMap)
  }

  // seeded fixture: points spread mostly along a fixed 8-dim axis, with
  // small noise on the others — PC1 must recover the axis
  private val axis = Seq(0.6f, -0.3f, 0.5f, 0.1f, -0.4f, 0.2f, 0.0f, 0.3f)
  private def fixture(n: Int, seed: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val t = rnd.nextGaussian() * 2.0
      i.toLong -> axis.map(ax =>
        (ax * t + rnd.nextGaussian() * 0.05).toFloat).toSeq
    }
  }

  test("engine == plain-Scala reference: component and projections") {
    val vecs = fixture(80, seed = 7)
    val df = vecs.toDF("vec_id", "embedding")
    val model = Pca.fitPc1(df, "vec_id", "embedding", rounds = 8)
    val (wantPc, wantProj) = reference(vecs, rounds = 8)
    assert(model.pcE6.toSeq === wantPc)
    val got = Pca.projectPc1(df, "vec_id", "embedding", rounds = 8)
      .as[(Long, Long)].collect().toMap
    assert(got === wantProj)
  }

  test("semantic: PC1 recovers the dominant axis (|cos| > 0.99)") {
    val df = fixture(200, seed = 11).toDF("vec_id", "embedding")
    val pc = Pca.fitPc1(df, "vec_id", "embedding").pcE6.map(_.toDouble)
    val ax = axis.map(_.toDouble)
    val cos = math.abs(
      pc.zip(ax).map { case (a, b) => a * b }.sum /
        (math.sqrt(pc.map(x => x * x).sum) *
          math.sqrt(ax.map(x => x * x).sum)))
    assert(cos > 0.99, s"|cos(PC1, axis)| = $cos")
  }

  test("semantic: projection separates two clusters along the axis") {
    // cluster A at +3·axis, cluster B at -3·axis
    val pts = (0 until 40).map { i =>
      val sgn = if (i < 20) 3.0f else -3.0f
      i.toLong -> axis.map(_ * sgn).toSeq
    }
    val proj = Pca.projectPc1(pts.toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .as[(Long, Long)].collect().toMap
    val a = (0L until 20L).map(proj)
    val b = (20L until 40L).map(proj)
    assert(a.max < b.min || b.max < a.min,
      s"clusters overlap: A=[${a.min},${a.max}] B=[${b.min},${b.max}]")
  }

  test("degenerate: identical vectors give zero scatter and the zero fixpoint") {
    // zero matrix → w = 0 every round, the mw = 0 guard keeps w — the
    // component collapses to the zero vector (no variance, no axis) and
    // every projection is 0; the oracle computes the identical fixpoint
    val pts = (0 until 5).map(i => i.toLong -> Seq(0.5f, 0.25f, -0.5f))
    val df = pts.toDF("vec_id", "embedding")
    val model = Pca.fitPc1(df, "vec_id", "embedding")
    assert(model.pcE6.toSeq === Seq(0L, 0L, 0L))
    val proj = Pca.projectPc1(df, "vec_id", "embedding")
      .as[(Long, Long)].collect().toMap
    assert(proj.values.forall(_ == 0L))
    val (wantPc, wantProj) = reference(pts, rounds = 8)
    assert(model.pcE6.toSeq === wantPc && proj === wantProj)
  }

  test("guards: ragged dims, empty corpus, rounds domain") {
    val ragged = Seq(1L -> Seq(0.1f, 0.2f), 2L -> Seq(0.1f))
      .toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Pca.fitPc1(ragged, "vec_id", "embedding")
    }
    intercept[IllegalArgumentException] {
      Pca.fitPc1(Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding"),
        "vec_id", "embedding")
    }
    intercept[IllegalArgumentException] {
      Pca.fitPc1(Seq(1L -> Seq(0.1f)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", rounds = 0)
    }
  }
}
