package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Dev scratch: print the catalyst trees the Spark 4 Column API builds,
  * to pin the node types [[graft.queries.SqlMirror]] must render. */
object ExprProbe {
  def main(args: Array[String]): Unit = {
    val exprs = Seq(
      col("Fe{2+}") / (col("Fe{2+}") + col("Mg{2+}")),
      lit(4.0) - col("Si{4+}"),
      col("Mn{2+}") / 3.0,
      -col("x"),
      least(col("a"), col("b")) + greatest(col("a"), lit(0.0)),
      when(col("a") > 0.0, col("a") / col("b")).otherwise(lit(0.0)),
      lit(2.0) * col("x") / (lit(2.0) + col("x")))
    exprs.foreach { c =>
      val e = Bridge.expression(c)
      println("== " + c.toString)
      println(e.treeString)
    }
  }
}
