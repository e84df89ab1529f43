package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def psiMap(df: org.apache.spark.sql.DataFrame) =
    df.select($"bucket".cast("string"), $"n_ref", $"n_cur", $"psi_e6")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("identical distributions score zero everywhere") {
    val snap = Seq("a", "a", "b", "c").toDF("k")
    val got = psiMap(Drift.categorical(snap, snap, "k"))
    assert(got.keySet === Set("a", "b", "c"))
    assert(got.values.forall(_._3 == 0L), s"nonzero PSI on identity: $got")
  }

  test("hand-computed categorical fixture, incl. a category absent on one side") {
    val ref = Seq("a", "a", "a", "b").toDF("k")
    val cur = Seq("a", "b", "b", "c").toDF("k")
    val got = psiMap(Drift.categorical(ref, cur, "k"))
    // reference replay: B=3, tr=4, tc=4 -> denom 5.5 both sides
    def contrib(nr: Long, nc: Long): Long = {
      val p = (nr + 0.5) / 5.5; val q = (nc + 0.5) / 5.5
      math.floor((p - q) * math.log(p / q) * 1e6 + 0.5).toLong
    }
    assert(got === Map(
      "a" -> ((3L, 1L, contrib(3, 1))),
      "b" -> ((1L, 2L, contrib(1, 2))),
      "c" -> ((0L, 1L, contrib(0, 1)))))
    // every contribution is non-negative (PSI's defining property) and
    // the shifted categories dominate the total
    assert(got.values.forall(_._3 >= 0L))
  }

  test("a real shift scores large; a mild one scores small (0.1/0.25 rubric)") {
    val ref = (1 to 900).map(_ => "en") ++ (1 to 100).map(_ => "de")
    val mild = (1 to 880).map(_ => "en") ++ (1 to 120).map(_ => "de")
    val hard = (1 to 400).map(_ => "en") ++ (1 to 600).map(_ => "de")
    def total(cur: Seq[String]) =
      psiMap(Drift.categorical(ref.toDF("k"), cur.toDF("k"), "k"))
        .values.map(_._3).sum / 1e6
    assert(total(mild) < 0.1, s"mild shift read as drift: ${total(mild)}")
    assert(total(hard) > 0.25, s"hard shift read as stable: ${total(hard)}")
  }

  test("numeric binning: frozen uniform bins, under/overflow buckets, null drop") {
    val ref = Seq[Option[Double]](Some(-5.0), Some(0.0), Some(9.99), Some(10.0),
      Some(25.0), None).toDF("v")
    val cur = Seq[Option[Double]](Some(5.0), Some(5.0)).toDF("v")
    val got = psiMap(Drift.numericUniform(ref, cur, "v", 0.0, 10.0, 2))
    // -5 -> underflow(-1); 0 -> bin 0; 9.99 -> bin 1; 10, 25 -> overflow(2)
    assert(got.keySet === Set("-1", "0", "1", "2"))
    assert(got("-1")._1 === 1L && got("0")._1 === 1L &&
      got("1")._1 === 1L && got("2")._1 === 2L)
    assert(got("1")._2 === 2L) // 5.0 is the [5,10) bin's LEFT edge -> bin 1
  }

  test("randomized vs a Scala reference model") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val cats = Seq("a", "b", "c", "d")
      def snap() = cats.flatMap(c =>
        (0 until 1 + rnd.nextInt(50)).map(_ => c))
      val refS = snap(); val curS = snap()
      val got = psiMap(Drift.categorical(refS.toDF("k"), curS.toDF("k"), "k"))
      val nr = cats.map(c => c -> refS.count(_ == c).toLong).toMap
      val nc = cats.map(c => c -> curS.count(_ == c).toLong).toMap
      val b = cats.size
      val (tr, tc) = (nr.values.sum, nc.values.sum)
      val want = cats.map { c =>
        val p = (nr(c) + 0.5) / (tr + 0.5 * b)
        val q = (nc(c) + 0.5) / (tc + 0.5 * b)
        c -> ((nr(c), nc(c),
          math.floor((p - q) * math.log(p / q) * 1e6 + 0.5).toLong))
      }.toMap
      assert(got === want, s"trial $trial")
    }
  }
}
