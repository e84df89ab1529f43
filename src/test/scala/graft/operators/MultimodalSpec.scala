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
