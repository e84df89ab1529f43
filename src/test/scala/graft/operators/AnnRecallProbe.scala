package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement utility (not a test): recall@k of the two ANN scale paths
  * vs brute-force ground truth on the driver testdata, across the knob
  * presets documented in [[Similarity]]'s scaladoc. Run with
  * `sbt "Test/runMain graft.operators.AnnRecallProbe [sfDir]"`.
  * The numbers in the Similarity preset table were produced by this
  * main at sf0.1 — re-run after any hashing/quantizer change. */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // deterministic query set: an unordered limit() is partition-order
    // dependent once the filter yields more than 200 rows
    val queries = corpus.filter(col("vec_id") % 10 === 0)
      .orderBy(col("vec_id")).limit(200)
    val k = 10

    val truth = Similarity.bruteForceTopK(queries, corpus, k)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (q, a) => q -> a.map(_._2).toSet }

    def recall(got: org.apache.spark.sql.DataFrame): Double = {
      val byQ = got.select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().groupBy(_._1)
        .map { case (q, a) => q -> a.map(_._2).toSet }
      val hits = truth.toSeq.map { case (q, t) =>
        byQ.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      hits.sum / hits.size
    }

    println(f"${"preset"}%-28s recall@$k")
    for ((tables, bits) <- Seq((4, 8), (8, 8), (16, 8), (8, 6), (16, 10))) {
      val r = recall(Similarity.lshTopK(queries, corpus, k, tables, bits))
      println(f"lsh tables=$tables%-3d bits=$bits%-3d       $r%.3f")
    }
    for ((nlist, nprobe) <- Seq((16, 1), (16, 4), (16, 8), (64, 8), (64, 16))) {
      val r = recall(Similarity.ivfTopK(queries, corpus, k, nlist, nprobe))
      println(f"ivf nlist=$nlist%-3d nprobe=$nprobe%-3d      $r%.3f")
    }
    // quantized IVF (VERDICT r6 #5): same candidate sets, int8-scored
    // with float re-rank of the top 3k — the recall delta vs the float
    // column above is the cost of storing 1-byte codes in the lists
    for ((nlist, nprobe) <- Seq((16, 4), (16, 8), (64, 8), (64, 16))) {
      val r = recall(Similarity.ivfTopKQuantized(queries, corpus, k,
        nlist, nprobe, rerank = 3 * k))
      println(f"ivfq nlist=$nlist%-3d nprobe=$nprobe%-3d     $r%.3f")
    }
    // IVF-PQ (VERDICT r9 #3): KMeansLloyd coarse lists + m-block product
    // codes, ADC candidate ranking, float rerank of the survivors
    for ((nlist, nprobe, m) <- Seq((8, 2, 4), (8, 4, 4), (16, 4, 4),
        (8, 2, 8), (16, 8, 4))) {
      val r = recall(IvfPq.ivfPqTopK(queries, corpus, k, nlist, nprobe,
        m = m, rerank = 3 * k))
      println(f"ivfpq nlist=$nlist%-3d nprobe=$nprobe%-2d m=$m%-2d  $r%.3f")
    }
    // the q_v9 gate shape: 5 queries (vec_id < 5) x exact top-3 = 15
    // possible hits — this count sets the driver floor
    val gq = corpus.filter(col("vec_id") < 5)
    val gc = corpus.filter(col("vec_id") >= 5)
    val gateTruth = Similarity.bruteForceTopK(gq, gc, 3)
      .select(col("query_id"), col("neighbor_id"))
    for ((nlist, nprobe, m, rerank, res) <- Seq(
        (8, 2, 4, 32, false), (8, 4, 4, 48, false),
        (8, 4, 8, 48, false), (16, 8, 8, 64, false),
        (16, 8, 8, 64, true), (8, 4, 8, 48, true), (16, 8, 4, 64, true))) {
      val gateHits = IvfPq.ivfPqTopK(gq, gc, k = 3, nlist, nprobe,
          m = m, rerank = rerank, residual = res)
        .select(col("query_id"), col("neighbor_id"))
        .join(gateTruth, Seq("query_id", "neighbor_id")).count()
      println(s"ivfpq gate hits (of 15) nlist=$nlist nprobe=$nprobe " +
        s"m=$m rerank=$rerank residual=$res: $gateHits")
    }
    spark.stop()
  }
}
