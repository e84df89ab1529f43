package graft.operators

import graft.SparkSpec

class ClusterTermsSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: class-exclusive terms outrank shared boilerplate") {
    // "the" appears everywhere (high f → low idf); exclusives dominate
    val docs = Seq(
      ("a", "the invoice the payment the invoice"),
      ("a", "the payment invoice"),
      ("b", "the cat the dog the cat"),
      ("b", "the dog cat")).toDF("cls", "text")
    val got = ClusterTerms.topTerms(docs, "cls", "text", k = 2)
      .select("cls", "term", "rank").as[(String, String, Int)]
      .collect().toSet
    assert(got === Set(
      ("a", "invoice", 1), ("a", "payment", 2),
      ("b", "cat", 1), ("b", "dog", 2)))
  }

  test("property: matches a driver reference model exactly (seeded)") {
    val rnd = new scala.util.Random(72)
    val vocab = (0 until 15).map(i => s"w$i")
    val rows = (1 to 120).map { _ =>
      (s"c${rnd.nextInt(4)}",
        (0 until rnd.nextInt(12) + 1)
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val k = 5
    val got = ClusterTerms.topTerms(rows.toDF("cls", "text"), "cls", "text", k)
      .as[(String, String, Long, Long, Int)].collect().toSet
    // reference: same formula in driver scala
    val toks = rows.flatMap { case (c, t) => t.split("\\s+").map(c -> _) }
    val tf = toks.groupBy(identity).map { case ((c, w), xs) => (c, w, xs.size.toLong) }
    val f = toks.groupBy(_._2).map { case (w, xs) => w -> xs.size.toLong }
    val classes = toks.map(_._1).distinct.size
    val a = toks.size.toDouble / classes
    val scored = tf.map { case (c, w, n) =>
      (c, w, n, n * math.floor(math.log(1.0 + a / f(w)) * 10000.0 + 0.5).toLong)
    }
    val want = scored.groupBy(_._1).flatMap { case (_, xs) =>
      xs.toSeq.sortBy(x => (-x._4, x._2)).zipWithIndex.take(k)
        .map { case ((c, w, n, s), i) => (c, w, n, s, i + 1) }
    }.toSet
    assert(got === want)
  }

  test("empty and null texts contribute nothing; k guard") {
    val docs = Seq(("a", "x y"), ("a", ""), ("b", null.asInstanceOf[String]))
      .toDF("cls", "text")
    val got = ClusterTerms.topTerms(docs, "cls", "text", k = 3)
      .select("cls").as[String].collect().toSeq
    assert(got.forall(_ == "a")) // class b has no tokens → no rows
    intercept[IllegalArgumentException] {
      ClusterTerms.topTerms(docs, "cls", "text", k = 0)
    }
  }
}
