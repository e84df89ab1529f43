package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs sharing the 3-gram "all rights reserved" (df=4) + unique tails;
  // one short doc below shingle length; one doc with no shared grams.
  private def corpus = Seq(
    (1L, "all rights reserved alpha beta gamma"),
    (2L, "all rights reserved delta epsilon zeta"),
    (3L, "all rights reserved eta theta iota"),
    (4L, "all rights reserved kappa lambda mu"),
    (5L, "tiny doc"),
    (6L, "completely unrelated words only here")
  ).toDF("doc_id", "text")

  test("stats: hand-computed document frequencies at minDf=4") {
    val got = Boilerplate.stats(corpus, "doc_id", "text",
        shingleLen = 3, minDf = 4)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._1)
    // docs 1-4: 6 tokens -> 4 shingles; exactly one ("all rights
    // reserved") reaches df=4 ("rights reserved <unique>" differs per doc)
    for (i <- 0 until 4) {
      val (_, nSh, nB, frac) = got(i)
      assert(nSh == 4 && nB == 1 && frac == 0.25)
    }
    val (_, nSh5, nB5, frac5) = got(4) // 2 tokens < shingleLen
    assert(nSh5 == 0 && nB5 == 0L && frac5 == 0.0)
    val (_, nSh6, nB6, _) = got(5) // 5 tokens -> 3 shingles, none shared
    assert(nSh6 == 3 && nB6 == 0L)
  }

  test("stats: every document appears exactly once, including short ones") {
    val got = Boilerplate.stats(corpus, "doc_id", "text")
    assert(got.count() == 6)
    assert(got.select("id").distinct().count() == 6)
  }

  test("prune removes high-boilerplate docs and keeps the rest") {
    // at minDf=4 and maxFrac=0.2, docs 1-4 (frac 0.25) go; 5 and 6 stay
    val kept = Boilerplate.prune(corpus, "doc_id", "text",
        shingleLen = 3, minDf = 4, maxFrac = 0.2)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(5L, 6L))
  }

  test("corpus parquet is read ~once (shingles cached, not re-derived)") {
    // Same FS-statistics measurement as PlanAuditSpec's q_d3 audit: the
    // three consumers of the shingle table (totals, df aggregation,
    // boilerplate join) must resolve to the cached relation, not three
    // parquet re-reads.
    import scala.jdk.CollectionConverters._
    val path = s"$sf0001/documents.parquet"
    val fileLen = {
      val d = new java.io.File(path)
      if (d.isDirectory) d.listFiles().map(_.length()).sum else d.length()
    }
    def bytesRead: Long =
      org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics
        .iterator().asScala
        .filter(_.getScheme == "file")
        .map(s => Option(s.getLong("bytesRead")).map(_.longValue()).getOrElse(0L))
        .sum
    val docs = spark.read.parquet(path)
    docs.schema // footer warm
    val before = bytesRead
    Boilerplate.stats(docs, "doc_id", "text").collect()
    val delta = bytesRead - before
    assert(delta <= 2 * fileLen,
      f"boilerplate read $delta bytes = ${delta.toDouble / fileLen}%.1fx " +
        "the documents parquet — shingle subplan is re-executing")
    NearDup.releaseMaterialized()
  }
}
