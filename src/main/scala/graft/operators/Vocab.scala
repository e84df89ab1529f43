package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Vocabulary indexing and id encoding — the LAST step before tensors:
  * turn a curated text corpus into the (token → id) table and per-doc
  * integer-id sequences a training loader consumes. Everything upstream
  * (dedup, quality, mixing, packing) exists to feed this emission.
  *
  * Id assignment is frequency rank — id 0 is the most frequent token,
  * ties broken by token string — so the mapping is a pure function of
  * the corpus (engine-portable, reproducible, and the id order doubles
  * as the frequency table a tokenizer-ologist reads). Out-of-vocabulary
  * tokens encode as [[OovId]] (kept, not dropped: sequence LENGTH must
  * survive encoding or positions shift).
  *
  * Scale shape: counting is one map-side-combinable groupBy over
  * exploded tokens. The rank itself is a single-partition window sort —
  * deliberately: it runs over the VOCABULARY (≤ millions of rows after
  * `minCount`, bounded further by `maxSize`), not the corpus, and a
  * vocabulary that no longer fits one task's sort is not a vocabulary.
  * Encoding joins the corpus's exploded (pos, token) stream against the
  * vocab table (broadcast when it fits — the common case) and rebuilds
  * each document's id array by position with one groupBy; nothing
  * corpus-sized is ever sorted globally or collected. */
object Vocab {

  /** Encoding of a token absent from the vocabulary. */
  val OovId: Long = -1L

  /** (token, id, n) frequency-ranked over the corpus: id 0 = most
    * frequent; `minCount` drops the long tail, `maxSize` truncates to
    * the top-k ids (both standard tokenizer-vocab knobs). */
  def build(df: DataFrame, textCol: String, minCount: Long = 1L,
      maxSize: Option[Int] = None): DataFrame = {
    require(minCount >= 1, s"minCount $minCount must be >= 1")
    maxSize.foreach(m => require(m >= 1, s"maxSize $m must be >= 1"))
    val counts = df
      .select(explode_outer(TextAnalysis.tokens(col(textCol))).as("token"))
      .filter(col("token").isNotNull)
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
    val ranked = counts.withColumn("id",
      row_number().over(Window.orderBy(col("n").desc, col("token")))
        .cast("long") - lit(1L))
    maxSize.fold(ranked)(m => ranked.filter(col("id") < m.toLong))
      .select(col("token"), col("id"), col("n"))
  }

  /** Encode each document as its position-ordered id sequence:
    * (idCol, ids array<long>, n_tokens, n_oov). Documents with no
    * tokens keep a row with an empty array (absence of content is not
    * absence of the document). */
  def encode(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val toks = df.select(col(idCol),
        posexplode_outer(TextAnalysis.tokens(col(textCol)))
          .as(Seq("pos", "token")))
    val joined = toks
      .join(vocab.select(col("token"), col("id").as("__tid")),
        Seq("token"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("__tid"), lit(OovId)).as("__tid"))
    joined.groupBy(col(idCol))
      // pos null ⇔ the document had no tokens (posexplode_outer's
      // placeholder row): the `when` is null there and collect_list
      // SKIPS nulls, so an empty document keeps an empty sequence
      // instead of a phantom struct(null, null) element
      .agg(sort_array(collect_list(when(col("pos").isNotNull,
        struct(col("pos"), col("__tid"))))).as("__seq"))
      .select(col(idCol),
        transform(col("__seq"), _.getField("__tid")).as("ids"),
        size(col("__seq")).as("n_tokens"),
        size(filter(col("__seq"), _.getField("__tid") === OovId))
          .as("n_oov"))
  }
}
