package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Decontaminate

/** Bloom filter + bloom-screened decontamination: no false negatives
  * ever, FPR near theory, distributed build == local build, and the
  * screened operator bit-identical to the exact one. */
class LongBloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted hash is found") {
    val rnd = new Random(7)
    val items = Array.fill(20000)(rnd.nextLong())
    val b = LongBloom.empty(items.length, 0.01)
    items.foreach(b.add)
    assert(items.forall(b.contains))
  }

  test("FPR lands near the theoretical curve") {
    val rnd = new Random(11)
    val n = 20000
    val inserted = Array.fill(n)(rnd.nextLong())
    for (fpp <- Seq(0.1, 0.01)) {
      val b = LongBloom.empty(n, fpp)
      inserted.foreach(b.add)
      val insertedSet = inserted.toSet
      val probes = Iterator.continually(rnd.nextLong())
        .filterNot(insertedSet).take(100000).toArray
      val measured = probes.count(b.contains).toDouble / probes.length
      // sized-for-fpp filters should realize within ~2x of nominal
      assert(measured < fpp * 2,
        s"fpp=$fpp measured=$measured — screen leaks too much")
    }
  }

  test("merge is a lossless OR: union filter finds both halves") {
    val rnd = new Random(13)
    val xs = Array.fill(5000)(rnd.nextLong())
    val (l, r) = xs.splitAt(2500)
    val a = LongBloom.empty(xs.length, 0.01)
    val b = LongBloom.empty(xs.length, 0.01)
    l.foreach(a.add)
    r.foreach(b.add)
    val u = a.merge(b)
    assert(xs.forall(u.contains))
  }

  test("distributed build over a DataFrame == local build, bit for bit") {
    val rnd = new Random(17)
    val xs = Array.fill(10000)(rnd.nextLong())
    val local = LongBloom.empty(xs.length, 0.01)
    xs.foreach(local.add)
    val dist = LongBloom.build(
      xs.toSeq.toDF("g").repartition(8), "g", xs.length, 0.01)
    assert(dist.k === local.k)
    assert(dist.words.toSeq === local.words.toSeq)
  }

  test("sizing: constant-in-corpus sketch stays small and k is sane") {
    val b = LongBloom.empty(1000000, 0.01)
    assert(b.sizeBytes < 1400000) // ~1.2 MB for a MILLION eval shingles
    assert(b.k >= 5 && b.k <= 10) // optimum ~6.6 at fpp=0.01
  }

  test("bloom-screened decontamination == exact decontamination") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val eval = docs.filter(col("doc_id") % 10 === 0)
    val exact = Decontaminate.overlaps(train, eval, "doc_id", "text", 4)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val screened = Decontaminate
      .overlapsBloomScreened(train, eval, "doc_id", "text", 4)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.nonEmpty, "fixture must actually contaminate")
    assert(screened === exact)
  }

  test("screen survives a sloppy fpp: exactness never depends on it") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 200)
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val eval = docs.filter(col("doc_id") % 5 === 0)
    val exact = Decontaminate.overlaps(train, eval, "doc_id", "text", 4)
      .orderBy("id").collect().toSeq
    // fpp=0.5: a deliberately terrible screen lets half the non-matches
    // through — the confirm join must still produce the exact answer
    val sloppy = Decontaminate
      .overlapsBloomScreened(train, eval, "doc_id", "text", 4, fpp = 0.5)
      .orderBy("id").collect().toSeq
    assert(sloppy === exact)
  }
}
