package graft.operators

import org.apache.spark.storage.StorageLevel

import graft.SparkSpec

class CheckpointsSpec extends SparkSpec {

  test("release actually frees a localCheckpoint's blocks") {
    val df = spark.range(100).toDF("x").localCheckpoint()
    assert(df.count() === 100L)
    val rdds = df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    assert(rdds.nonEmpty, "localCheckpoint'ed frame must expose a LogicalRDD")
    assert(rdds.forall(_.getStorageLevel != StorageLevel.NONE),
      "checkpoint storage should be live before release")
    Checkpoints.release(df)
    assert(rdds.forall(_.getStorageLevel == StorageLevel.NONE),
      "release must unpersist the checkpoint RDD")
  }

  test("release is a safe no-op on plans without checkpoint RDDs") {
    Checkpoints.release(spark.range(3).toDF("x")) // must not throw
  }
}
