package graft.operators

import graft.SparkSpec

/** L181 seeded randomization test (r15): the add-one-in floor, the
  * planted-shift minimal p, the exchangeable mid-range read, the
  * division-free compare replayed in BigInt, and the conservative
  * empty-side convention. */
class PermTestSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, String)]) = {
    val df = rows.map { case (c, v, id) => ("p", c, v, id) }
      .toDF("p", "c", "v", "id")
    PermTest.meanDiff(df, "p", "c", "v", "id", "a", "b")
      .collect().head
  }

  test("planted gross shift: p reads the add-one-in minimum 1/65") {
    val rows = (1 to 60).map(i =>
      (if (i % 2 == 0) "a" else "b",
        if (i % 2 == 0) 1000L else 10L, s"d$i"))
    val r = run(rows)
    assert(r.getLong(4) === 0L)        // no replicate exceeds
    assert(r.getLong(5) === 1000000L / 65L)
  }

  test("identical cohort values: every replicate ties or exceeds, p = 1") {
    // all values equal → observed diff 0, every |diff_b| >= 0
    val rows = (1 to 40).map(i =>
      (if (i % 2 == 0) "a" else "b", 7L, s"d$i"))
    val r = run(rows)
    assert(r.getLong(4) === 64L && r.getLong(5) === 1000000L)
  }

  test("exchangeable values: p lands mid-range, never 0") {
    val rnd = new scala.util.Random(181)
    val rows = (1 to 200).map(i =>
      (if (rnd.nextBoolean()) "a" else "b",
        rnd.nextInt(1000).toLong, s"d$i"))
    val p = run(rows).getLong(5)
    assert(p >= 1000000L / 65L && p <= 1000000L)
    assert(p > 100000L, s"exchangeable p read $p — suspiciously small")
  }

  test("seeded BigInt replay of the division-free compare") {
    val rnd = new scala.util.Random(2027)
    val rows = (1 to 150).map(i =>
      (if (i <= 75) "a" else "b",
        rnd.nextInt(500).toLong + (if (i <= 75) 40L else 0L), s"x$i"))
    val r = run(rows)
    // plain-Scala mirror with the same md5 bit assignments
    def bit(id: String, b: Int): Long = {
      // the packed form: bit (b mod 56) of digest (b div 56)
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$id#${b / 56}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(14)
      (java.lang.Long.parseLong(hex, 16) >> (b % 56)) % 2
    }
    val oa = rows.filter(_._1 == "a").map(_._2).sum
    val ob = rows.filter(_._1 == "b").map(_._2).sum
    val ona = rows.count(_._1 == "a"); val onb = rows.count(_._1 == "b")
    val obsD = (BigInt(oa) * onb - BigInt(ob) * ona).abs
    val exceed = (0 until PermTest.B).count { b =>
      val asg = rows.map(t => (bit(t._3, b), t._2))
      val sa = asg.filter(_._1 == 0L).map(_._2).sum
      val na = asg.count(_._1 == 0L)
      val sb = asg.filter(_._1 == 1L).map(_._2).sum
      val nb = asg.count(_._1 == 1L)
      na == 0 || nb == 0 ||
        (BigInt(sa) * nb - BigInt(sb) * na).abs * ona * onb >=
          obsD * na * nb
    }
    assert(r.getLong(4) === exceed.toLong)
    assert(r.getLong(5) === 1000000L * (1 + exceed) / 65L)
  }

  test("an observed empty cohort still evaluates (conservative, defined)") {
    val rows = (1 to 30).map(i => ("a", i.toLong, s"d$i"))
    val r = run(rows)
    assert(r.getLong(2) === 0L)       // n_b = 0
    assert(r.getLong(5) >= 1000000L / 65L)
  }
}
