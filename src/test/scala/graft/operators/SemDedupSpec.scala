package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // Cluster {1,2,3}: pairwise cosine >= 0.95 (computed below the fixture);
  // member 3 leans away from the pack, so it is the LEAST
  // centroid-similar (the paper's "most distinctive"). Doc 10 is
  // orthogonal to everything — a singleton.
  private def fixture = Seq(
    (1L, Seq(1.000f, 0.000f, 0f)),
    (2L, Seq(0.999f, 0.040f, 0f)),
    (3L, Seq(0.950f, 0.310f, 0f)),
    (10L, Seq(0.000f, 0.000f, 1f))
  ).toDF("vec_id", "embedding")

  test("min-id labels: cluster = component min, singleton keeps with NULL cluster") {
    val got = SemDedup.label(fixture, threshold = 0.9)
      .orderBy(col("vec_id"))
      .as[(Long, Option[Long], Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, Some(1L), true), (2L, Some(1L), false), (3L, Some(1L), false),
      (10L, None, true)))
  }

  test("prune keeps exactly the keepers and all pair-free docs") {
    val kept = SemDedup.prune(fixture, threshold = 0.9)
      .select(col("vec_id")).as[Long].collect().toSet
    assert(kept == Set(1L, 10L))
  }

  test("distinctive keeper picks the least centroid-similar member, not the min id") {
    // centroid ≈ (0.983, 0.117, 0): sims ≈ 0.993 (1), 0.997 (2),
    // 0.981 (3) — member 3 wins under the paper's rule where min-id
    // picks 1; margins are ~1e-2, far above the 1e-6 rounding grain.
    val got = SemDedup.label(fixture, threshold = 0.9, distinctive = true)
      .orderBy(col("vec_id"))
      .as[(Long, Option[Long], Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, Some(1L), false), (2L, Some(1L), false), (3L, Some(1L), true),
      (10L, None, true)))
  }

  test("distinctive keeper breaks exact similarity ties to the smaller id") {
    // 1 and 2 are mirror images about their centroid (1, 0): identical
    // centroid cosine after rounding, so the tie goes to id 1.
    val sym = Seq(
      (1L, Seq(1.0f, 0.05f)),
      (2L, Seq(1.0f, -0.05f))
    ).toDF("vec_id", "embedding")
    val got = SemDedup.label(sym, threshold = 0.9, distinctive = true)
      .orderBy(col("vec_id"))
      .as[(Long, Option[Long], Boolean)].collect().toSeq
    assert(got == Seq((1L, Some(1L), true), (2L, Some(1L), false)))
  }

  test("label agrees with an exhaustive Scala reference on the sf0.001 embeddings") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val got = SemDedup.label(e, threshold = 0.45)
      .orderBy(col("vec_id"))
      .as[(Long, Option[Long], Boolean)].collect().toSeq

    // Reference: exhaustive pairs → union-find → min-id keeper.
    val vecs = e.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val parent = scala.collection.mutable.Map(vecs.map(v => v._1 -> v._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    val inPair = scala.collection.mutable.Set.empty[Long]
    for {
      i <- vecs.indices; j <- (i + 1) until vecs.length
      if BigDecimal(cos(vecs(i)._2, vecs(j)._2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP) >= 0.45
    } {
      inPair += vecs(i)._1; inPair += vecs(j)._1
      val (ra, rb) = (find(vecs(i)._1), find(vecs(j)._1))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = vecs.toSeq.map { case (id, _) =>
      if (inPair(id)) (id, Some(find(id)), find(id) == id)
      else (id, None, true)
    }
    assert(got == want)
  }
}
