package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Class-level guard for the VERDICT r9 defect: `java.io.tmpdir` is
  * per-MACHINE, not per-JVM, so any battery query that writes to a FIXED
  * well-known tmp path lets two concurrent Spark sessions (e.g. `sbt test`
  * racing a `graft.Verify` run) overwrite each other's `_temporary` commit
  * dirs and crash both. The q_s12 fix (session-keyed staging) must hold as
  * a CLASS, not an instance — this spec walks every main-source `.scala`
  * file and fails if a tmp-path construction site lacks a session key.
  *
  * A site is considered keyed when the surrounding window contains one of:
  *  - `stagedPath` — the [[Tables.stagedPath]] helper (keys by corpus-dir
  *    hash + applicationId);
  *  - `applicationId` — a hand-rolled session key (the helper's scheme);
  *  - `randomUUID` — a per-run unique dir;
  *  - `sys.env` — an operator-controlled harness override (ScaleProbe's
  *    cross-run fixture cache, regenerating which costs minutes and which
  *    is never run concurrently with the gates).
  */
class StagingPathSpec extends AnyFunSuite {

  private val srcRoot = Paths.get("src/main/scala")

  private def scalaFiles(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toSeq

  private val tmpPattern = "(java\\.io\\.tmpdir|\"/tmp)".r
  private val keyPattern =
    "(stagedPath|applicationId|randomUUID|sys\\.env)".r

  test("every tmp-path construction in src/main carries a session key") {
    assert(Files.isDirectory(srcRoot), s"expected to run from repo root; $srcRoot missing")
    val offenders = for {
      file <- scalaFiles(srcRoot)
      lines = Files.readAllLines(file).asScala.toVector
      (line, i) <- lines.zipWithIndex
      trimmed = line.trim
      // code sites only — scaladoc/comments may legitimately DISCUSS the
      // defect (Tables.stagedPath's own doc does)
      if !trimmed.startsWith("*") && !trimmed.startsWith("//") &&
        !trimmed.startsWith("/*")
      if tmpPattern.findFirstIn(line).isDefined
      // the expression may continue across lines (string concat) and the
      // key may be bound just above (val uid = randomUUID) — inspect a
      // small window around the site
      window = lines.slice(math.max(0, i - 3), math.min(lines.length, i + 4))
        .mkString("\n")
      if keyPattern.findFirstIn(window).isEmpty
    } yield s"$file:${i + 1}: $line"
    assert(offenders.isEmpty,
      "fixed machine-wide tmp paths (VERDICT r9 #1) — route through " +
        "Tables.stagedPath or key by applicationId/UUID:\n" +
        offenders.mkString("\n"))
  }

  test("self-check: the guard fires on a seeded fixed-path construction") {
    // the exact shape of the r9 defect (Relational.scala:40 pre-fix)
    val seeded = Vector(
      "  private def bad(s: SparkSession): String = {",
      "    val tmp = s\"${System.getProperty(\"java.io.tmpdir\")}/graft_fixed\"",
      "    tmp",
      "  }")
    val hits = for {
      (line, i) <- seeded.zipWithIndex
      if tmpPattern.findFirstIn(line).isDefined
      window = seeded.slice(math.max(0, i - 3), math.min(seeded.length, i + 4))
        .mkString("\n")
      if keyPattern.findFirstIn(window).isEmpty
    } yield i
    assert(hits.nonEmpty, "guard failed to flag a seeded fixed tmp path")
  }
}
