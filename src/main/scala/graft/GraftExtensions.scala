package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expressions.CosineSimilarity

/** Session extensions — registers graft's native expressions so they are
  * callable from SQL (`SELECT graft_cosine(a, b)`,
  * `SELECT graft_jaccard(a, b)`) as well as the DataFrame API. Enable
  * with `.config("spark.sql.extensions", "graft.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "graft_cosine takes 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
    // graft_nfc: Unicode NFC normalization (L103) — the dedup-key
    // normalization pass, SQL-callable for parity with the Column form
    ext.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(
        classOf[graft.expressions.NfcNormalize].getName, "graft_nfc"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "graft_nfc takes 1 argument")
        graft.expressions.NfcNormalize(children.head)
      }))
    // graft_jaccard: the battery's set-similarity kernel
    // (TextAnalysis.jaccard) as a SQL function — built from stock
    // codegen'd catalyst nodes, so the SQL form rides whole-stage
    // codegen exactly like the Column form (semantics pinned equal in
    // GraftExtensionsSpec)
    ext.injectFunction((
      new FunctionIdentifier("graft_jaccard"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_jaccard"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "graft_jaccard takes 2 arguments")
        import org.apache.spark.sql.catalyst.expressions._
        import org.apache.spark.sql.types.DoubleType
        val inter = Size(ArrayIntersect(children.head, children(1)))
        val union = Size(ArrayUnion(children.head, children(1)))
        If(EqualTo(union, Literal(0)), Literal(0.0),
          Divide(Cast(inter, DoubleType), Cast(union, DoubleType)))
      }))
  }
}
