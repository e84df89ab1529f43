package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Wire-format contract for the REAL-POSTGRES sink path (VERDICT r7 #6):
  * no Postgres driver jar ships in this sandbox, so the executed JDBC
  * tests run on Derby — this spec drives `toJdbc` end-to-end against the
  * recording driver instead and pins exactly what a Postgres server
  * would receive: the atomic `INSERT … ON CONFLICT (key) DO NOTHING`
  * statement (the fix for the reference's racy probe-then-append,
  * save_to_raw_customers_py.py:49-58 / init_qb_schema.sql:3-12), the
  * bind arity (no key re-bind — that's the NOT EXISTS dialects' shape),
  * the per-flush probe-before-batch protocol, transactional commits, and
  * both branches of the batch-count contract (SUCCESS_NO_INFO fallback
  * vs real counts). */
class IdempotentAppendWireSpec extends SparkSpec {
  import spark.implicits._

  private val Url = RecordingJdbc.UrlPrefix + "mem"
  private val InsertSql =
    "INSERT INTO raw_customers (id,v) VALUES (?,?) " +
      "ON CONFLICT (id) DO NOTHING"

  private def run(noInfo: Boolean, existing: Long,
      rows: Seq[(Int, String)], batchSize: Int = 2): Long = {
    RecordingJdbc.ensureRegistered()
    RecordingJdbc.reset(noInfo, existing)
    IdempotentAppend.toJdbc(rows.toDF("id", "v"), Url, "raw_customers",
      "id", IdempotentAppend.Postgres, batchSize = batchSize)
  }

  test("Postgres dialect emits the exact ON CONFLICT statement, binds " +
      "each column once, never the key twice") {
    run(noInfo = true, existing = 0,
      Seq(1 -> "a", 2 -> "b", 3 -> "c", 4 -> "d", 5 -> "e"))
    val evs = RecordingJdbc.recorded
    val prepared = evs.filter(_.kind == "prepare").map(_.sql).distinct
    assert(prepared.contains(InsertSql),
      s"expected the ON CONFLICT insert among: $prepared")
    // NOT EXISTS shapes are the other dialects' wire format — a Postgres
    // run must never fall back to them
    assert(!prepared.exists(_.contains("NOT EXISTS")))
    val batches = evs.filter(e => e.kind == "executeBatch")
    assert(batches.nonEmpty)
    assert(batches.forall(_.sql == InsertSql))
    // every bound row carries exactly the 2 data columns, id first
    // (bindKeyTwice=false: param 3 would be the NOT EXISTS key re-bind)
    val boundRows = batches.flatMap(_.rows)
    assert(boundRows.size == 5)
    assert(boundRows.forall(_.size == 2))
    assert(boundRows.map(_.head).toSet ==
      Set(1, 2, 3, 4, 5).map(i => i: Any))
  }

  test("flush protocol per connection: autocommit off first, probe " +
      "precedes every batch, commit follows it, batchSize caps a flush") {
    run(noInfo = true, existing = 0,
      Seq(1 -> "a", 2 -> "b", 3 -> "c", 4 -> "d", 5 -> "e"))
    val byConn = RecordingJdbc.recorded.groupBy(_.conn)
    assert(byConn.nonEmpty)
    byConn.foreach { case (_, evs) =>
      // transaction mode is established before any statement work
      assert(evs.head.kind == "setAutoCommit" && evs.head.sql == "false")
      assert(evs.filter(_.kind == "executeBatch")
        .forall(_.rows.size <= 2), "a flush exceeded batchSize")
      // scan the per-connection tape: each executeBatch must be
      // immediately preceded (modulo binds) by its existing-keys probe
      // and followed by a commit before the next probe starts
      val tape = evs.filter(e =>
        Set("executeQuery", "executeBatch", "commit")(e.kind))
      tape.sliding(3, 3).foreach {
        case Seq(probe, batch, commit) =>
          assert(probe.kind == "executeQuery" &&
            probe.sql.startsWith("SELECT COUNT(*) FROM raw_customers " +
              "WHERE id IN ("), s"probe out of order: $tape")
          assert(batch.kind == "executeBatch")
          assert(commit.kind == "commit")
          // the probe binds exactly the keys of the batch it guards
          assert(probe.rows.head.toSet == batch.rows.map(_.head).toSet)
        case short => assert(short.isEmpty || short.head.kind != "commit",
          s"dangling tail in flush tape: $short")
      }
    }
  }

  test("SUCCESS_NO_INFO branch: inserted = pending - probed-existing " +
      "(the reWriteBatchedInserts count protocol)") {
    // every probe answers 1 already-present key; with single-partition
    // data (one connection) and batchSize 10 ⇒ one flush of 5 pending
    val n = run(noInfo = true, existing = 1,
      Seq(1 -> "a", 2 -> "b", 3 -> "c", 4 -> "d", 5 -> "e"),
      batchSize = 10)
    val flushes = RecordingJdbc.recorded.count(_.kind == "executeBatch")
    // pending-per-flush minus existing, summed across however many
    // non-empty partitions the shuffle produced
    val boundTotal = RecordingJdbc.recorded
      .filter(_.kind == "executeBatch").map(_.rows.size).sum
    assert(boundTotal == 5)
    assert(n == 5 - flushes.toLong * 1)
  }

  test("real-counts branch: driver counts are summed as-is") {
    val n = run(noInfo = false, existing = 0,
      Seq(1 -> "a", 2 -> "b", 3 -> "c"))
    assert(n == 3)
  }

  test("null keys and duplicate keys never reach the wire") {
    RecordingJdbc.ensureRegistered()
    RecordingJdbc.reset(noInfo = true, existing = 0)
    val df = Seq((Some(1), "a"), (Some(1), "dup"), (None, "nullkey"),
      (Some(2), "b")).toDF("id", "v")
    IdempotentAppend.toJdbc(df, Url, "raw_customers", "id",
      IdempotentAppend.Postgres)
    val bound = RecordingJdbc.recorded
      .filter(_.kind == "executeBatch").flatMap(_.rows).map(_.head)
    assert(bound.toSet == Set(1: Any, 2: Any), s"bound keys: $bound")
    assert(bound.size == 2, "duplicate key reached the wire")
  }
}
