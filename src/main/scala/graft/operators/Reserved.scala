package graft.operators

/** Reserved-name collision guard — the class fix for a recurring
  * ADVICE pattern: an operator that aliases internal/output columns
  * silently misbehaves (ambiguous references, wrong-column reads) when
  * a CALLER column already carries that name. Every operator that
  * introduces fixed output or struct-field names guards them here, so
  * the failure is an immediate, named `require` instead of an analysis
  * error or a silent wrong answer downstream. */
object Reserved {

  /** Fail fast if any caller-supplied name collides with the
    * operator's reserved names. */
  def guard(callerCols: Seq[String], reserved: Seq[String],
      operator: String): Unit = {
    val hit = callerCols.filter(reserved.contains)
    require(hit.isEmpty,
      s"$operator reserves column name(s) ${hit.mkString(", ")} — " +
        "rename the input column(s)")
  }
}
