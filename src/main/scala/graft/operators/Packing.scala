package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — grouping documents into fixed-token-budget packs for
  * pretraining batches (the concatenate-and-chunk scheme: documents are
  * laid end-to-end in a deterministic order and cut every `budget` tokens;
  * a document belongs to the pack its START offset falls in).
  *
  * Packing quality vs scale: first-fit-decreasing packs tighter but needs
  * a global mutable bin state — inherently sequential. Concatenate-and-
  * chunk is the production choice at corpus scale because it is a pure
  * window function: within each SHARD (a pipeline-chosen column — source,
  * date, hash bucket) the only state is a running sum. One hash shuffle on
  * the shard column, no global order, no driver state; shards pack
  * independently, so 100 TB packs as wide as the shard count. Waste is
  * bounded by avg_doc/budget per cut, which is why budgets are chosen ≫
  * median document length.
  */
object Packing {

  /** Adds `pack_id` (0-based per shard): documents ordered by `orderCol`
    * within each shard are packed greedily; a document's pack is
    * `floor(start_offset / budget)` where start_offset is the running sum
    * of `sizeCol` over all earlier documents in the shard.
    *
    * Contract: `orderCol` must be UNIQUE within a shard (it is the only
    * ordering key; ties would make the running sum — and thus pack
    * assignment — depend on Spark's arbitrary tie order, breaking
    * reproducibility the way an un-tiebroken session window would).
    * Pack ids are contiguous from 0 when every document fits the budget;
    * a document larger than `budget` overhangs its pack and the next
    * START offset may skip pack numbers — by design, not a bug. */
  def packBySize(df: DataFrame, shardCol: String, orderCol: String,
      sizeCol: Column, budget: Int): DataFrame =
    packBySize(df, Seq(shardCol), orderCol, sizeCol, budget)

  /** Multi-column shard variant — e.g. `(source, split)` so a pack never
    * spans a train/test boundary. */
  def packBySize(df: DataFrame, shardCols: Seq[String], orderCol: String,
      sizeCol: Column, budget: Int): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    require(shardCols.nonEmpty, "at least one shard column required")
    val w = Window.partitionBy(shardCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // start offset = cumulative size minus own size; sizes are token
    // counts (≪ 2^52), so the double division is exact and the long cast
    // is a true floor for the non-negative operand
    val start = sum(sizeCol).over(w) - sizeCol
    df.withColumn("pack_id", (start / budget).cast("long"))
  }
}
