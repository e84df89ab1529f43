package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expressions.CosineSimilarity

/** Session extensions — registers graft's native expressions so they are
  * callable from SQL (`SELECT graft_cosine(a, b)`) as well as the
  * DataFrame API. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "graft_cosine takes 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
  }
}
