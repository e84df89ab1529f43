package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17 optimization-round scratch probe: decompose the heavy battery
  * queries into their operator stages and time each with the bench's
  * warmup + session config, so the optimization targets the stage that
  * actually costs (guide §1). Not part of the API; timings to stderr. */
object OptProbe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(
      f"[opt] $label%-48s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val which = if (args.isEmpty) Set("e15") else args.toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)

    // bench-equivalent warmup
    {
      import spark.implicits._
      val w = spark.read.parquet(s"$sfDir/region.parquet")
      w.join(broadcast(w.select(col("r_regionkey"))), "r_regionkey")
        .groupBy(col("r_name")).count().collect()
      val docs3 = Seq((1L, "a b c d e a b c d e"),
        (2L, "a b c d e a b c d f"),
        (3L, "x y z w v u t s r q")).toDF("doc_id", "text")
      graft.operators.NearDup.ensemblePairs(docs3, "doc_id", "text").count()
      graft.operators.Clusters.connectedComponents(
        docs3.select(col("doc_id").as("id_a"),
          (col("doc_id") + 1).as("id_b"))).count()
      graft.operators.Clusters.releaseResults()
      graft.operators.NearDup.releaseMaterialized()
    }

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")

    if (which("e15")) {
      for (r <- 1 to 2) {
        val pairs = time(s"e15.pairs r$r") {
          val p = graft.operators.SetSimJoin.pairs(docs, "doc_id", "text",
            shingleLen = 3, threshold = 0.8)
          p.count(); p
        }
        val cc = time(s"e15.cc r$r") {
          val c = graft.operators.Clusters.connectedComponents(
            pairs.select(col("id_a"), col("id_b")))
          c.count(); c
        }
        time(s"e15.join+split+sort r$r") {
          val labels = cc.select(col("id").as("doc_id"), col("cluster"))
          val clustered = docs.join(labels, Seq("doc_id"), "left")
            .withColumn("cluster",
              coalesce(col("cluster"), col("doc_id").cast("long")))
          graft.operators.Sampling.hashSplit(clustered, col("cluster"),
              Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
            .select(col("doc_id"), col("cluster"), col("split"))
            .orderBy(col("doc_id")).count()
        }
        time(s"e15.full r$r") {
          SparkEntry.queries("q_e15_safe_split")(spark, sfDir).count()
        }
      }
    }

    if (which("d16")) {
      for (r <- 1 to 2) {
        val pairs = time(s"d16.pairs r$r") {
          val p = graft.operators.SetSimJoin.pairs(docs, "doc_id", "text",
            shingleLen = 3, threshold = 0.8)
            .select(col("id_a"), col("id_b"))
          p.count(); p
        }
        time(s"d16.post r$r") {
          val u = pmod(conv(substring(md5(concat(
            col("id_a").cast("string"), lit(":"),
            col("id_b").cast("string"))), 1, 14), 16, 10)
            .cast("long"), lit(1000000000L))
          val tagged = pairs.withColumn("__u", u)
          val chA = tagged.filter(pmod(col("__u"), lit(3L)) =!= 0L)
            .select(col("id_a"), col("id_b"))
          val chB = tagged
            .filter(pmod(expr("__u DIV 3"), lit(3L)) =!= 0L)
            .select(col("id_a"), col("id_b"))
          val truth = pairs.agg(count(lit(1)).as("n_true"))
          graft.operators.CaptureRecapture.chapman(chA, chB,
            Seq("id_a", "id_b")).crossJoin(truth).count()
        }
        time(s"d16.full r$r") {
          SparkEntry.queries("q_d16_dup_coverage")(spark, sfDir).count()
        }
      }
    }

    if (which("pairs")) {
      // SetSimJoin.pairs stage decomposition (mirrors the operator body)
      import graft.operators.{NearDup, SetSimJoin}
      for (r <- 1 to 2) {
        val t6 = 800000L
        val sh = time(s"pairs.shingles r$r") {
          val x = NearDup.hashedShingles(docs, "doc_id", "text", 3).persist()
          x.count(); x
        }
        val ex = sh.select(col("id"), explode_outer(col("hs")).as("g"))
          .filter(col("g").isNotNull)
        time(s"pairs.dfreq r$r") {
          ex.groupBy(col("g")).agg(count(lit(1)).as("df")).count()
        }
        val dfreq = ex.groupBy(col("g")).agg(count(lit(1)).as("df"))
        val ordered = ex.join(dfreq, "g")
          .groupBy(col("id"))
          .agg(sort_array(collect_list(struct(col("df"), col("g"))))
            .as("ord"))
        val n = size(col("ord")).cast("long")
        val ceilT = call_function("div", lit(t6) * n + lit(999999L),
          lit(1000000L))
        val prefix = ordered
          .select(col("id"), explode_outer(slice(
            transform(col("ord"), _.getField("g")),
            lit(1), (n - ceilT + lit(1L)).cast("int"))).as("key"))
          .filter(col("key").isNotNull)
        time(s"pairs.prefix r$r") { prefix.count() }
        val cand = time(s"pairs.bucketPairs r$r") {
          val c = NearDup.bucketPairs(
            prefix.select(col("id"), lit(0).as("band"), col("key")),
            Int.MaxValue).persist()
          c.count(); c
        }
        val sizes = sh.select(col("id"), size(col("hs")).cast("long").as("n"))
        val sized = cand
          .join(sizes.select(col("id").as("id_a"), col("n").as("__na")),
            "id_a")
          .join(sizes.select(col("id").as("id_b"), col("n").as("__nb")),
            "id_b")
          .filter(least(col("__na"), col("__nb")) * lit(1000000L) >=
            lit(t6) * greatest(col("__na"), col("__nb")))
          .select(col("id_a"), col("id_b")).persist()
        time(s"pairs.sizefilter r$r") { sized.count() }
        System.err.println(s"[opt] counts: prefix=${prefix.count()} " +
          s"cand=${cand.count()} sized=${sized.count()}")
        val pairStruct = struct(col("id_a"), col("id_b")).as("pair")
        val melted = sized.select(col("id_a").as("id"), pairStruct,
            lit("a").as("role"))
          .unionAll(sized.select(col("id_b").as("id"), pairStruct,
            lit("b").as("role")))
        time(s"pairs.confirm.join r$r") {
          melted.join(sh, "id").count()
        }
        time(s"pairs.confirm.group r$r") {
          melted.join(sh, "id")
            .groupBy(col("pair"))
            .agg(
              first(when(col("role") === "a", col("hs")),
                ignoreNulls = true).as("hs_a"),
              first(when(col("role") === "b", col("hs")),
                ignoreNulls = true).as("hs_b")).count()
        }
        time(s"pairs.confirm r$r") {
          NearDup.confirmJaccard(sized, sh, 0.8).count()
        }
        sh.unpersist(); cand.unpersist(); sized.unpersist()
      }
    }

    if (which("g6")) {
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
      for (r <- 1 to 2) {
        val pairs = time(s"g6.bucketPairs r$r") {
          val buckets = ev.select(col("event_type").as("band"),
              call_function("div", graft.Tables.epochMicros(ev, "ts"),
                lit(300000000L)).as("key"),
              col("user_id").as("id"))
            .filter(col("band").isNotNull && col("key").isNotNull &&
              col("id").isNotNull)
            .distinct()
          val p = graft.operators.NearDup.bucketPairs(buckets, 10000)
            .persist()
          System.err.println(s"[opt] g6 pairs=${p.count()}")
          p
        }
        time(s"g6.adamicAdar r$r") {
          graft.operators.LinkPredict.adamicAdar(pairs, "id_a", "id_b")
            .orderBy(col("aa_e6").desc, col("cn").desc, col("a"), col("b"))
            .limit(100).count()
        }
        pairs.unpersist()
        time(s"g6.full r$r") {
          SparkEntry.queries("q_g6_link_predict")(spark, sfDir).count()
        }
      }
    }

    if (which("misc")) {
      for (r <- 1 to 2) {
        time(s"a37.full r$r") {
          SparkEntry.queries("q_a37_friedman")(spark, sfDir).count()
        }
        time(s"qr18.full r$r") {
          SparkEntry.queries("q_qr18_benford_chisq")(spark, sfDir).count()
        }
        time(s"g2.full r$r") {
          SparkEntry.queries("q_g2_triangles")(spark, sfDir).count()
        }
        time(s"g4.full r$r") {
          SparkEntry.queries("q_g4_assortativity")(spark, sfDir).count()
        }
        time(s"d16.full r$r") {
          SparkEntry.queries("q_d16_dup_coverage")(spark, sfDir).count()
        }
      }
    }

    if (which("vq")) {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      for (r <- 1 to 2) {
        val coarse = time(s"vq.coarse-fit r$r") {
          graft.operators.KMeansLloyd.fitModel(emb, "vec_id", "embedding",
            k = 8, rounds = 2)
        }
        time(s"vq.pq-residual r$r") {
          graft.operators.IvfPq.fitPqResidual(emb, "vec_id", "embedding",
            coarse, m = 8, ksub = 8, rounds = 2).codes.count()
        }
        time(s"vq.v11.full r$r") {
          SparkEntry.queries("q_v11_pq_residual_codes")(spark, sfDir).count()
        }
        time(s"vq.v9.full r$r") {
          SparkEntry.queries("q_v9_ann_ivfpq")(spark, sfDir).count()
        }
        time(s"vq.v8.full r$r") {
          SparkEntry.queries("q_v8_kmeans")(spark, sfDir).count()
        }
      }
    }

    if (which("g1")) {
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      for (r <- 1 to 2) {
        val pairs = time(s"g1.pairs r$r") {
          val p = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
            .select(col("o_custkey").as("cust"),
              (col("l_suppkey") + lit(1000000L)).as("supp"))
            .distinct().persist()
          p.count(); p
        }
        time(s"g1.ranks r$r") {
          val edges = pairs.select(col("cust").as("src"),
              col("supp").as("dst"))
            .unionAll(pairs.select(col("supp").as("src"),
              col("cust").as("dst")))
          graft.operators.PageRank.ranks(edges, "src", "dst",
            iterations = 5).count()
        }
        pairs.unpersist()
        time(s"g1.full r$r") {
          SparkEntry.queries("q_g1_pagerank")(spark, sfDir).count()
        }
      }
    }

    if (which("confirm_ab")) {
      // old union-array form vs new set-arithmetic form of the jaccard
      // confirm, alternated within one session so host drift can't fake
      // a winner
      import graft.operators.{NearDup, SetSimJoin}
      val sh = NearDup.hashedShingles(docs, "doc_id", "text", 3).persist()
      sh.count()
      // the SetSimJoin-sized candidate set (43k pairs at sf0.1), where
      // the per-pair array arithmetic actually shows
      val t6 = 800000L
      val ex = sh.select(col("id"), explode_outer(col("hs")).as("g"))
        .filter(col("g").isNotNull)
      val dfreq = ex.groupBy(col("g")).agg(count(lit(1)).as("df"))
      val ordered = ex.join(dfreq, "g")
        .groupBy(col("id"))
        .agg(sort_array(collect_list(struct(col("df"), col("g")))).as("ord"))
      val nsz = size(col("ord")).cast("long")
      val ceilT = call_function("div", lit(t6) * nsz + lit(999999L),
        lit(1000000L))
      val prefix = ordered
        .select(col("id"), explode_outer(slice(
          transform(col("ord"), _.getField("g")),
          lit(1), (nsz - ceilT + lit(1L)).cast("int"))).as("key"))
        .filter(col("key").isNotNull)
      val cand0 = NearDup.bucketPairs(
        prefix.select(col("id"), lit(0).as("band"), col("key")),
        Int.MaxValue)
      val sizes = sh.select(col("id"), size(col("hs")).cast("long").as("n"))
      val cand = cand0
        .join(sizes.select(col("id").as("id_a"), col("n").as("__na")), "id_a")
        .join(sizes.select(col("id").as("id_b"), col("n").as("__nb")), "id_b")
        .filter(least(col("__na"), col("__nb")) * lit(1000000L) >=
          lit(t6) * greatest(col("__na"), col("__nb")))
        .select(col("id_a"), col("id_b")).persist()
      System.err.println(s"[opt] cand=${cand.count()}")
      def confirmOld(pairs: DataFrame): Long = {
        val pairStruct = struct(col("id_a"), col("id_b")).as("pair")
        val melted = pairs.select(col("id_a").as("id"), pairStruct,
            lit("a").as("role"))
          .unionAll(pairs.select(col("id_b").as("id"), pairStruct,
            lit("b").as("role")))
        melted.join(sh, "id")
          .groupBy(col("pair"))
          .agg(
            first(when(col("role") === "a", col("hs")),
              ignoreNulls = true).as("hs_a"),
            first(when(col("role") === "b", col("hs")),
              ignoreNulls = true).as("hs_b"))
          .select(col("pair.id_a").as("id_a"),
            col("pair.id_b").as("id_b"),
            round(graft.functions.TextAnalysis.jaccard(
              col("hs_a"), col("hs_b")), 6).as("jaccard"))
          .filter(col("jaccard") >= 0.8).count()
      }
      for (r <- 1 to 3) {
        time(s"confirm.old r$r") { confirmOld(cand) }
        time(s"confirm.new r$r") {
          NearDup.confirmJaccard(cand, sh, 0.8).count()
        }
      }
      sh.unpersist(); cand.unpersist()
    }

    if (which("cc_ab")) {
      import graft.operators.{Clusters, SetSimJoin}
      val pairs = SetSimJoin.pairs(docs, "doc_id", "text", 3, 0.8)
        .select(col("id_a"), col("id_b")).persist()
      System.err.println(s"[opt] pairs=${pairs.count()}")
      for (r <- 1 to 3) {
        time(s"cc.dist r$r") {
          Clusters.connectedComponents(pairs, localEdgeBound = 0L).count()
        }
        time(s"cc.local r$r") {
          Clusters.connectedComponents(pairs).count()
        }
      }
      pairs.unpersist()
    }

    if (which("e15join")) {
      // SMJ vs broadcast for the docs ⟕ labels attach, one session
      import graft.operators.{Clusters, Sampling, SetSimJoin}
      val pairs = SetSimJoin.pairs(docs, "doc_id", "text", 3, 0.8)
        .select(col("id_a"), col("id_b"))
      val labels = Clusters.connectedComponents(pairs)
        .select(col("id").as("doc_id"), col("cluster")).persist()
      System.err.println(s"[opt] labels=${labels.count()}")
      def attach(l: DataFrame): Long =
        Sampling.hashSplit(
          docs.join(l, Seq("doc_id"), "left")
            .withColumn("cluster",
              coalesce(col("cluster"), col("doc_id").cast("long"))),
          col("cluster"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .select(col("doc_id"), col("cluster"), col("split"))
          .orderBy(col("doc_id")).count()
      for (r <- 1 to 3) {
        time(s"e15join.smj r$r") { attach(labels) }
        time(s"e15join.bcast r$r") { attach(broadcast(labels)) }
      }
      labels.unpersist()
    }

    if (which("qr31")) {
      for (r <- 1 to 2) {
        val d = docs
          .filter(col("doc_id").isNotNull && col("n_chars").isNotNull
            && col("source").isNotNull && col("lang").isNotNull)
        val real = d.select(col("source").as("g"), col("n_chars").as("v"))
        val planted = d.filter(pmod(col("doc_id"), lit(4L)) === 0L)
          .select(lit("planted_shift").as("g"),
            (col("n_chars") + lit(150L)).as("v"))
        time(s"qr31.ks-real r$r") {
          graft.operators.KsDrift.perGroup(real, "g", "v").count()
        }
        time(s"qr31.ks-planted-asis r$r") {
          graft.operators.KsDrift.perGroup(real.unionByName(planted),
            "g", "v").filter(col("g") === "planted_shift").count()
        }
        time(s"qr31.ks-planted-relabel r$r") {
          graft.operators.KsDrift.perGroup(
            real.select(lit("__rest").as("g"), col("v"))
              .unionByName(planted), "g", "v")
            .filter(col("g") === "planted_shift").count()
        }
        time(s"qr31.full r$r") {
          SparkEntry.queries("q_qr31_drift_fdr")(spark, sfDir).count()
        }
      }
    }

    spark.stop()
  }
}
