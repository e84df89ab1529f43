package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort-retention matrix over an event stream — "of the entities first
  * seen in bucket c, how many were active again o buckets later". The
  * companion report to [[Funnel]]: funnels measure conversion through a
  * sequence, retention measures return over time.
  *
  * Scale shape: one distinct over (entity, bucket) — map-side combined,
  * the frame every later step reads — one min-aggregate for the cohort
  * assignment, one key-partitioned join back on entity, one final
  * aggregate to the (cohorts × offsets)-sized matrix. Nothing scales
  * with raw event count past the first distinct; the matrix itself is
  * tiny (offsets are bounded by the observation span). Bucketing is
  * integer `DIV`, computed once — timestamps must be nonnegative epoch
  * micros (`DIV` truncates toward zero, which equals floor only there —
  * the same precondition as the as-of/sessionize chunk math). */
object Retention {

  /** The matrix: (cohort_bucket, offset_buckets, n, entity_sum) — n
    * distinct entities from cohort `cohort_bucket` active exactly
    * `offset_buckets` buckets after their first appearance, with the
    * canonical digit-string id-sum witness pinning WHICH entities.
    * Offset 0 is the cohort size itself. Null entities/timestamps are
    * dropped. */
  def matrix(df: DataFrame, entityCol: String, tsUs: Column,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0L, s"bucketUs must be > 0, got $bucketUs")
    val active = df
      .select(col(entityCol).as("__ent"), tsUs.as("__t"))
      .filter(col("__ent").isNotNull && col("__t").isNotNull)
      .select(col("__ent"), expr(s"__t DIV ${bucketUs}L").as("__b"))
      .distinct()
    val cohort = active.groupBy(col("__ent")).agg(min(col("__b")).as("__c"))
    active.join(cohort, Seq("__ent"))
      .groupBy(col("__c").as("cohort_bucket"),
        (col("__b") - col("__c")).as("offset_buckets"))
      .agg(count(lit(1)).as("n"),
        sum(col("__ent").cast("decimal(38,0)")).cast("string")
          .as("entity_sum"))
  }
}
