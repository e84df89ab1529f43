package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seeded randomization test for a difference in means (r15, L181;
  * Fisher 1935 the design-of-experiments randomization argument;
  * Dwass 1957, Ann. Math. Stat. 28, the Monte Carlo form — the
  * ASSUMPTION-FREE member of the location panel: MW/KS/CvM test
  * distributional hypotheses through rank machinery, this asks the
  * barest question "could THIS mean gap arise from relabeling",
  * with no distributional assumption at all, on the raw values).
  *
  * Form, stated precisely: the UNCONDITIONAL randomization test —
  * each replicate k ∈ [0, b) reassigns every row to A/B by one
  * PACKED md5 bit: bit k mod 56 of md5(id ‖ '#' ‖ (k div 56))
  * (i.i.d. fair coin; group sizes vary binomially
  * rather than being held fixed — the exact-permutation variant
  * would need a distributed coupled shuffle for no additional
  * validity under the same null "labels don't matter"). Everything
  * is deterministic (seeded salts) and integer:
  *   exceed_b ⟺ |S_Ab·n_Bb − S_Bb·n_Ab| · n_A·n_B
  *            ≥ |S_A·n_B − S_B·n_A| · n_Ab·n_Bb
  * (the mean-gap compare cross-multiplied — NO division anywhere,
  * so no quantization exists to cascade; replicates with an empty
  * side count as exceed — the conservative convention, documented)
  *   p_e6 = div(10⁶·(1 + Σ exceed), B + 1)
  * (the +1 add-one-in estimator — the observed labeling is one of
  * the B+1; p can never read 0, Davison & Hinkley 1997 §4.1).
  *
  * Capacity (re-derived, r15 self-review): the compare's left side
  * is |S_Ab·n_Bb − S_Bb·n_Ab|·n_A·n_B ≤ (N²·v_max)·(N²/4) in
  * DECIMAL(38,0) ⇒ N⁴·v_max < 4·10³⁸ — N ≤ ~8·10⁸ rows/panel at
  * v_max = 10³ (documented; subsample beyond).
  *
  * Scale shape: the B-replicate fan-out is a JIT'd per-partition
  * kernel (r17; previously an explode-by-B through the hash
  * aggregate) accumulating the conditional sums in flat long arrays
  * per panel — panels×B partial rows leave each partition, one
  * (panel, rep) merge aggregation follows, then a 1-row-per-panel
  * observed frame joined back on panel and a B-row fold. Nothing
  * corpus-shaped past the kernel; the blowup never materializes as
  * rows at all. */
object PermTest {

  /** Replicate count: 64 → p resolution 1/65 ≈ 0.0154, under the
    * 0.05 convention with margin; deterministic (salts 0..63). */
  val B = 64

  /** Per-panel randomization test: (panelCol, n_a, n_b, b_reps,
    * n_exceed, p_e6). `idCol` seeds the replicate assignment —
    * any stable row identity. `b` sets the replicate count: the p
    * RESOLUTION is 1/(b+1), and a consumer that feeds a
    * multiple-comparisons layer must size it so the smallest
    * achievable p clears the corrected threshold — BH at m tests
    * needs 1/(b+1) ≤ α/m, i.e. b ≥ m/α − 1 (measured live in r15:
    * at b = 64, m = 20 the BH discovery set is STRUCTURALLY empty —
    * the q_qr30 lesson, stated here so nobody re-learns it). */
  def meanDiff(df: DataFrame, panelCol: String, cohortCol: String,
      valueCol: String, idCol: String, cohortA: String,
      cohortB: String, b: Int = B): DataFrame = {
    require(cohortA != cohortB, "cohort labels must differ")
    require(b >= 16 && b <= 4096, s"replicates $b outside [16, 4096]")
    val d38 = "decimal(38,0)"
    Reserved.guard(Seq(panelCol),
      Seq("__p", "__c", "__v", "__id", "__b", "__bit", "__hs", "__sa", "__na",
        "__sb", "__nb", "__oa", "__ona", "__ob", "__onb", "__ex",
        "__psa", "__pna", "__psb", "__pnb",
        "n_a", "n_b", "b_reps", "n_exceed", "p_e6"),
      "PermTest")
    // panel keys ride the same string normalization as the cohort/id
    // columns (r17): the replicate kernel below is a typed
    // mapPartitions and needs a concrete panel encoder; every battery
    // caller already passes string panels, so the output column is
    // unchanged for them.
    val base = df
      .filter(col(panelCol).isNotNull && col(cohortCol).isNotNull &&
        col(valueCol).isNotNull && col(idCol).isNotNull)
      .select(col(panelCol).cast("string").as("__p"),
        col(cohortCol).cast("string").as("__c"),
        col(valueCol).cast("long").as("__v"),
        col(idCol).cast("string").as("__id"))
      .filter(col("__c").isin(cohortA, cohortB))
    val obs = base.groupBy(col("__p"))
      .agg(sum(when(col("__c") === cohortA, col("__v")).otherwise(0L))
          .as("__oa"),
        sum((col("__c") === cohortA).cast("long")).as("__ona"),
        sum(when(col("__c") === cohortB, col("__v")).otherwise(0L))
          .as("__ob"),
        sum((col("__c") === cohortB).cast("long")).as("__onb"))
    // PACKED coin flips (r15 bench fix, measured): one md5 per
    // (row, replicate) cost 51M digests at b = 512 on the gate
    // corpus and read 69.8 s in the battery; each digest carries 56
    // i.i.d. bits, so ⌈b/56⌉ salted digests per row buy all b flips
    // — 50× fewer digests, identical statistical properties (every
    // replicate still keys off a distinct hash bit). Replicate k
    // reads bit k mod 56 of digest k div 56.
    val nSalts = (b + 55) / 56
    val hs = transform(sequence(lit(0), lit(nSalts - 1)),
      s => conv(substring(md5(concat(col("__id"), lit("#"),
        s.cast("string"))), 1, 14), 16, 10).cast("long"))
    // Replicate fan-out as a JIT'd per-partition kernel (r17
    // optimization; the minhashSignatures discipline): the previous
    // explode-by-b form pushed |rows|·b tuples (51M at b = 512 on the
    // gate corpus) through the hash aggregate — row-at-a-time hash
    // probes on a key space of only panels×b. The kernel accumulates
    // the same conditional sums in flat long arrays per panel (one
    // scalar loop per row — digests sliced bit by bit exactly as the
    // old `shiftright`/`pmod` expressions: bit k = (hs[k/56] >> (k%56))
    // & 1 on nonnegative 56-bit longs) and emits panels×b partial rows
    // per partition; the groupBy below merges partitions. Integer
    // sums, order-independent — identical output by construction.
    val spark = df.sparkSession
    import spark.implicits._
    val partial = base
      .withColumn("__hs", hs)
      .select(col("__p"), col("__v"), col("__hs"))
      .as[(String, Long, Array[Long])]
      .mapPartitions { rows =>
        final class Acc {
          val sa = new Array[Long](b); val na = new Array[Long](b)
          val sb = new Array[Long](b); val nb = new Array[Long](b)
        }
        val acc = new java.util.HashMap[String, Acc]()
        rows.foreach { case (p, v, h) =>
          var a = acc.get(p)
          if (a == null) { a = new Acc; acc.put(p, a) }
          var k = 0
          while (k < b) {
            if (((h(k / 56) >> (k % 56)) & 1L) == 0L) {
              a.sa(k) += v; a.na(k) += 1
            } else {
              a.sb(k) += v; a.nb(k) += 1
            }
            k += 1
          }
        }
        val out = new scala.collection.mutable.ArrayBuffer[
          (String, Int, Long, Long, Long, Long)](acc.size() * b)
        acc.forEach { (p, a) =>
          var k = 0
          while (k < b) {
            out += ((p, k, a.sa(k), a.na(k), a.sb(k), a.nb(k)))
            k += 1
          }
        }
        out.iterator
      }
      .toDF("__p", "__b", "__psa", "__pna", "__psb", "__pnb")
    val reps = partial
      .groupBy(col("__p"), col("__b"))
      .agg(sum(col("__psa")).as("__sa"), sum(col("__pna")).as("__na"),
        sum(col("__psb")).as("__sb"), sum(col("__pnb")).as("__nb"))
    val obsDiff = abs(col("__oa").cast(d38) * col("__onb").cast(d38)
      - col("__ob").cast(d38) * col("__ona").cast(d38))
    val repDiff = abs(col("__sa").cast(d38) * col("__nb").cast(d38)
      - col("__sb").cast(d38) * col("__na").cast(d38))
    val exceed = when(col("__na") === 0L || col("__nb") === 0L, 1L)
      .otherwise((repDiff * col("__ona").cast(d38)
          * col("__onb").cast(d38)
        >= obsDiff * col("__na").cast(d38) * col("__nb").cast(d38))
        .cast("long"))
    reps.join(obs, Seq("__p"))
      .withColumn("__ex", exceed)
      .groupBy(col("__p"))
      .agg(max(col("__ona")).as("n_a"), max(col("__onb")).as("n_b"),
        count(lit(1)).as("b_reps"), sum(col("__ex")).as("n_exceed"))
      .withColumn("p_e6", call_function("div",
        lit(1000000L) * (lit(1L) + col("n_exceed")),
        lit((b + 1).toLong)))
      .select(col("__p").as(panelCol), col("n_a"), col("n_b"),
        col("b_reps"), col("n_exceed"), col("p_e6"))
  }
}
