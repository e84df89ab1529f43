package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // two linguistically disjoint vocabularies — hashed features never
  // collide enough to blur them at m=512
  private def prose(i: Int) =
    s"the quick brown fox number $i jumps over the lazy dog and runs home"
  private def soup(i: Int) =
    s"zzq$i xkcd qwerty asdf zxcv plugh$i xyzzy grault garply waldo fred"

  private def corpus(n: Int) =
    ((1 to n).map(i => (i.toLong, prose(i), 1)) ++
      (1 to n).map(i => ((i + 1000).toLong, soup(i), 0)))
      .toDF("doc_id", "text", "label")

  test("separates two vocabularies on training data (hand-small fixture)") {
    val df = corpus(20)
    val model = QualityClassifier.train(
      df.filter($"label" === 1), df.filter($"label" === 0),
      "doc_id", "text", m = 512, iters = 30)
    val scored = QualityClassifier.score(df, "doc_id", "text", model)
      .join(df.select($"doc_id", $"label"), Seq("doc_id"))
      .select($"label", $"logit_e6").as[(Int, Long)].collect()
    val (pos, neg) = scored.partition(_._1 == 1)
    assert(pos.forall(_._2 > 0), s"positive doc scored <= 0: ${pos.toSeq}")
    assert(neg.forall(_._2 < 0), s"negative doc scored >= 0: ${neg.toSeq}")
  }

  test("held-out generalization: classifies unseen docs of each class") {
    val df = corpus(40)
    // train on even ids, evaluate on odd — no document overlap
    val train = df.filter($"doc_id" % 2 === 0)
    val model = QualityClassifier.train(
      train.filter($"label" === 1), train.filter($"label" === 0),
      "doc_id", "text", m = 512, iters = 30)
    val held = QualityClassifier.score(
        df.filter($"doc_id" % 2 === 1), "doc_id", "text", model)
      .join(df.select($"doc_id", $"label"), Seq("doc_id"))
      .select($"label", $"logit_e6").as[(Int, Long)].collect()
    val acc = held.count { case (y, l) => (l > 0) == (y == 1) }.toDouble /
      held.length
    assert(acc >= 0.95, s"held-out accuracy $acc")
  }

  test("retraining is bit-exact under repartitioning (L43 discipline)") {
    val df = corpus(15)
    def fit(parts: Int) = QualityClassifier.train(
      df.filter($"label" === 1).repartition(parts),
      df.filter($"label" === 0).repartition(parts),
      "doc_id", "text", m = 256, iters = 8)
    val a = fit(1)
    val b = fit(13)
    assert(a.biasE6 === b.biasE6)
    assert(a.weightsE6.toSeq === b.weightsE6.toSeq,
      "weight vectors diverged across partitionings")
  }

  test("featureless documents score the bias alone; prune keeps positives") {
    val df = corpus(10).union(Seq((5000L, "", -1)).toDF("doc_id", "text", "label"))
    val model = QualityClassifier.train(
      df.filter($"label" === 1), df.filter($"label" === 0),
      "doc_id", "text", m = 256, iters = 20)
    val s = QualityClassifier.score(df, "doc_id", "text", model)
      .filter($"doc_id" === 5000L)
      .select($"n_feats", $"logit_e6").as[(Long, Long)].head()
    assert(s._1 === 0L && s._2 === model.biasE6)
    // the featureless doc's fate is the bias sign by contract — assert
    // the LABELED docs split exactly
    val kept = QualityClassifier.prune(df, "doc_id", "text", model)
      .filter($"label" >= 0).select($"label").as[Int].collect()
    assert(kept.nonEmpty && kept.forall(_ == 1),
      s"prune kept label-0 docs: ${kept.toSeq.distinct}")
    assert(kept.length === 10, s"prune dropped positives: ${kept.length}/10")
  }

  test("scoring plan: m-row weight table broadcasts, no cartesian") {
    val df = corpus(10)
    val model = QualityClassifier.train(
      df.filter($"label" === 1), df.filter($"label" === 0),
      "doc_id", "text", m = 256, iters = 2)
    val scored = QualityClassifier.score(df, "doc_id", "text", model)
    scored.collect()
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"cartesian in scoring plan:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"weight join did not broadcast:\n${plan.take(2000)}")
  }

  test("real documents: fluent prose vs token-scrambled copies, held out") {
    // the canonical quality task: the same unigram mass, destroyed word
    // ORDER — only the bigram features separate, exactly what the GPT-3
    // style filter must learn. Scramble = sort tokens (deterministic).
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text")
    val scrambled = docs.select(($"doc_id" + 100000L).as("doc_id"),
      concat_ws(" ", sort_array(split($"text", "\\s+"))).as("text"))
    val isTrain = ($"doc_id" % 2 === 0)
    val model = QualityClassifier.train(
      docs.filter(isTrain), scrambled.filter(isTrain),
      "doc_id", "text", m = 4096, iters = 30)
    val held = QualityClassifier.score(
        docs.filter(!isTrain).withColumn("y", lit(1))
          .union(scrambled.filter(!isTrain).withColumn("y", lit(0))),
        "doc_id", "text", model)
      .join(
        docs.withColumn("y", lit(1)).union(scrambled.withColumn("y", lit(0)))
          .select($"doc_id", $"y"),
        Seq("doc_id"))
      .select($"y", $"logit_e6").as[(Int, Long)].collect()
    val acc = held.count { case (y, l) => (l > 0) == (y == 1) }.toDouble /
      held.length
    assert(acc >= 0.9,
      s"held-out fluent-vs-scrambled accuracy $acc on ${held.length} docs")
  }
}
