package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("packBinary: binary content + typed metadata struct") {
    val packed = Multimodal.packBinary(docs, "doc_id", "text")
    val f = packed.schema("content")
    assert(f.dataType == org.apache.spark.sql.types.BinaryType)
    // metadata agrees with the blob
    val bad = packed.filter(
      col("meta.n_bytes") =!= length(col("content")) ||
        col("meta.checksum") =!= md5(col("content")))
    assert(bad.count() == 0)
  }

  test("extractFeatures: mapPartitions stub decode is deterministic and typed") {
    implicit val s: SparkSession = spark
    val packed = Multimodal.packBinary(docs.limit(20), "doc_id", "text")
    val feats = Multimodal.extractFeatures(packed.as[MediaRecord]).collect()
    assert(feats.length == 20)
    val byId = feats.map(f => f.doc_id -> f).toMap
    val check = packed.select(col("doc_id"), col("meta.n_bytes"), col("meta.checksum"))
      .as[(Long, Long, String)].collect()
    check.foreach { case (id, n, sum) =>
      val f = byId(id)
      assert(f.width == (n % 1920).toInt && f.height == ((n * 7919) % 1080).toInt
        && f.n_frames == (n / 64).toInt + 1 && f.feat_checksum == sum)
    }
  }

  test("sampleChunks: fixed-size slices from the blob") {
    val packed = Multimodal.packBinary(docs.limit(5), "doc_id", "text")
    val rows = Multimodal.sampleChunks(packed, chunkBytes = 16, stride = 4)
      .select(col("doc_id"), col("chunks")).as[(Long, Seq[Array[Byte]])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, chunks) =>
      assert(chunks.nonEmpty && chunks.forall(_.length <= 16))
    }
  }

  test("resizeStub truncates to the byte budget and refreshes metadata") {
    val packed = Multimodal.packBinary(docs.limit(10), "doc_id", "text")
    val resized = Multimodal.resizeStub(packed, targetW = 64, targetH = 48)
    val rows = resized.select(col("doc_id"), col("content"),
        col("meta.n_bytes"), col("meta.checksum"), col("meta.media_type"),
        col("width"), col("height"))
      .as[(Long, Array[Byte], Long, String, String, Int, Int)].collect()
    assert(rows.nonEmpty)
    val budget = (64 * 48 * 0.125).toInt // 384
    rows.foreach { case (_, content, nBytes, checksum, mediaType, w, h) =>
      assert(content.length <= budget && nBytes == content.length)
      assert(w == 64 && h == 48)
      assert(mediaType.endsWith(";resized=64x48"))
      // metadata checksum reflects the NEW content, not the original
      val md = java.security.MessageDigest.getInstance("MD5")
      val want = md.digest(content).map("%02x".format(_)).mkString
      assert(checksum == want)
    }
  }

  // plain-Scala reference of the stub decode + dHash (r10, q_m6)
  private def refHash(text: String): Long = {
    val n = text.length
    val lum = Array.tabulate(36) { k =>
      val start = k * n / 36; val end = (k + 1) * n / 36
      if (end <= start) 0L
      else Math.floorDiv(
        text.substring(start, end).map(_.toInt.toLong).sum, end - start)
    }
    (0 until 32).map { b =>
      val k1 = b / 8 * 9 + b % 8
      if (lum(k1) < lum(k1 + 1)) 1L << b else 0L
    }.sum
  }

  test("dHash expression AND kernel match the plain-Scala reference") {
    val texts = Seq("", "x", "short", "a" * 36, "ab" * 50,
      "The quick brown fox jumps over the lazy dog. " * 3) ++
      docs.select("text").as[String].take(20).toSeq
    val got = texts.toDF("text")
      .select(Multimodal.dHash32(
        Multimodal.luminanceGrid(col("text"), 36)).as("h"))
      .as[Long].collect().toSeq
    assert(got === texts.map(refHash))
    // the JIT'd scoring-path kernel must agree with the expression form
    // (which is what the DuckDB oracle replays)
    val kernel = Multimodal.dHashKernel(
        texts.zipWithIndex.map(_.swap).toDF("id", "text"), "id", "text")
      .orderBy(col("id")).as[(Long, Long)].collect().toSeq.map(_._2)
    assert(kernel === texts.map(refHash))
  }

  test("perceptual near-dup: banding equals the exhaustive scan; " +
      "a local edit stays within Hamming 3") {
    val base = "The quick brown fox jumps over the lazy dog again and " +
      "again until the corpus repeats itself for forty lines or so."
    val rows = Seq(
      1L -> base,
      2L -> base.replace("quick", "quack"), // one local edit
      3L -> base,                           // exact dup
      4L -> base.reverse,                   // far away
      5L -> ("z" * 120))
    val packed = Multimodal.packBinary(rows.toDF("doc_id", "text"),
      "doc_id", "text")
    val got = Multimodal.perceptualNearDup(packed)
      .orderBy(col("id_a"), col("id_b"))
      .as[(Long, Long, Int)].collect().toSeq
    // exhaustive reference over the same hashes
    val hs = rows.map { case (id, t) => id -> refHash(t) }
    val want = for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      hd = java.lang.Long.bitCount(ha ^ hb) if hd <= 3
    } yield (a, b, hd)
    assert(got === want.sortBy(p => (p._1, p._2)))
    assert(got.contains((1L, 3L, 0)), "exact dup must be Hamming 0")
    assert(got.exists(p => p._1 == 1L && p._2 == 2L),
      "a one-word edit must stay within the Hamming threshold")
    assert(!got.exists(p => p._2 == 4L || p._2 == 5L),
      "unrelated content must not pair")
  }

  test("metaProfile prunes the blob column out of the scan") {
    val tmp = tmpDir("mm")
    Multimodal.packBinary(docs, "doc_id", "text", keep = Seq("source"))
      .write.parquet(tmp)
    val profile = Multimodal.metaProfile(spark.read.parquet(tmp), "source")
    val plan = profile.queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: .*".r.findFirstIn(plan).getOrElse("")
    assert(!readSchema.contains("content"),
      s"blob column not pruned from scan: $readSchema")
    assert(profile.count() > 0)
  }
}
