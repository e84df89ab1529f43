package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Layout

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  // plain-Scala Morton reference
  private def spreadRef(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    (v | (v << 1)) & 0x5555555555555555L
  }
  private def zRef(a: Long, b: Long): Long = spreadRef(a) | (spreadRef(b) << 1)

  test("zValue matches the bit-by-bit definition on seeded inputs") {
    val rnd = new scala.util.Random(21)
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0xFFFFFFFFL, 0xFFFFFFFFL)) ++
      (1 to 200).map(_ => (rnd.nextInt(Int.MaxValue).toLong,
        rnd.nextInt(Int.MaxValue).toLong))
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z === zRef(a, b), s"z($a, $b)")
      // bit-by-bit: bit i of a at 2i, bit i of b at 2i+1
      for (i <- 0 until 32) {
        assert(((z >>> (2 * i)) & 1L) === ((a >>> i) & 1L))
        assert(((z >>> (2 * i + 1)) & 1L) === ((b >>> i) & 1L))
      }
    }
  }

  test("z-order layout prunes a 2-D box on BOTH dims; single-sort cannot") {
    // uniform 256x256 grid, 64k rows, 16 files either way
    val grid = spark.range(0, 65536).select(
      (col("id") / 256).cast("long").as("x"),
      pmod(col("id") * 2654435761L, lit(256L)).as("y"))
    val single = tmpDir("layout_single")
    val zord = tmpDir("layout_z")
    grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(single)
    Layout.zorderWrite(grid, "x", "y", zord, files = 16)
    // a box narrow in both dims: 1/8 of each axis. The z trade: a few
    // more files than the perfect single-dim prune on the SORTED dim,
    // bounded pruning on BOTH dims — vs total blindness off-dim.
    val (lo, hi) = (64L, 95L)
    val tZ = Layout.filesTouched(spark, zord, "x", "y", lo, hi, lo, hi)
    // x-sorted files each span all of y: a y-only predicate touches all
    val yOnlySingle = Layout.filesTouched(spark, single, "x", "y",
      0L, 255L, lo, hi)
    assert(yOnlySingle === 16L, "x-sorted layout should be y-blind")
    val yOnlyZ = Layout.filesTouched(spark, zord, "x", "y", 0L, 255L, lo, hi)
    assert(yOnlyZ <= 12L,
      s"z layout must prune files on y ALONE, touched $yOnlyZ/16")
    val xOnlyZ = Layout.filesTouched(spark, zord, "x", "y", lo, hi, 0L, 255L)
    assert(xOnlyZ <= 12L,
      s"z layout must prune files on x alone, touched $xOnlyZ/16")
    assert(tZ <= 6L,
      s"z layout should bound the 1/64-area box to a few files, got $tZ")
  }

  test("zorderWrite rejects negative keys and a reserved __z column") {
    val neg = Seq((-1L, 3L), (2L, 4L)).toDF("x", "y")
    val e1 = intercept[IllegalArgumentException] {
      Layout.zorderWrite(neg, "x", "y", tmpDir("layout_neg"), files = 2)
    }
    assert(e1.getMessage.contains("negative"))
    val clash = Seq((1L, 2L, 9L)).toDF("x", "y", "__z")
    val e2 = intercept[IllegalArgumentException] {
      Layout.zorderWrite(clash, "x", "y", tmpDir("layout_clash"), files = 2)
    }
    assert(e2.getMessage.contains("__z"))
  }
}
