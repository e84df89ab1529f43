package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CentroidsSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: integer floor-mean per (class, dim); negatives floor correctly") {
    val df = Seq(
      (0, Seq(1.0f, -1.0f)),
      (0, Seq(2.0f, -2.0f)),
      (1, Seq(0.5f, 0.25f))).toDF("label", "embedding")
    val got = Similarity.classCentroids(df, "label")
      .orderBy(col("label"), col("dim"))
      .as[(Int, Int, Long, Long)].collect().toSeq
    // class 0 dim 1: (-1e6 + -2e6) / 2 = -1500000 exactly; floor = same
    assert(got === Seq(
      (0, 0, 2L, 1500000L), (0, 1, 2L, -1500000L),
      (1, 0, 1L, 500000L), (1, 1, 1L, 250000L)))
    // a case where floor vs truncate differ: sum -3, n 2 → floor -2
    val odd = Seq((0, Seq(-1.0E-6f)), (0, Seq(-2.0E-6f)))
      .toDF("label", "embedding")
    val m = Similarity.classCentroids(odd, "label")
      .select(col("mean_e6")).as[Long].head()
    assert(m === -2L, "floor division, not truncation toward zero")
  }

  test("property: equals a driver integer reference on random vectors (seeded)") {
    val rnd = new scala.util.Random(73)
    val rows = (1 to 200).map { _ =>
      (rnd.nextInt(4), (0 until 8).map(_ => rnd.nextFloat() * 4 - 2))
    }
    val got = Similarity.classCentroids(
        rows.map { case (l, v) => (l, v.map(_.toFloat)) }
          .toDF("label", "embedding"), "label")
      .as[(Int, Int, Long, Long)].collect().toSet
    val want = rows
      .flatMap { case (l, v) =>
        v.zipWithIndex.map { case (x, i) =>
          (l, i) -> math.floor(x.toFloat.toDouble * 1e6 + 0.5).toLong }
      }
      .groupBy(_._1)
      .map { case ((l, d), xs) =>
        val qs = xs.map(_._2)
        (l, d, qs.size.toLong, Math.floorDiv(qs.sum, qs.size.toLong))
      }.toSet
    assert(got === want)
  }

  test("null embeddings contribute nothing") {
    val df = Seq((0, Some(Seq(1.0f))), (0, None)).toDF("label", "embedding")
    val got = Similarity.classCentroids(df, "label")
      .as[(Int, Int, Long, Long)].collect().toSeq
    assert(got === Seq((0, 0, 1L, 1000000L)))
  }
}
