package graft.petro

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Plot-data operators: the pandas.eval expression mini-language bridge
  * and the data reductions behind the reference's plotting classes
  * (reference: src/petropandas/_plotting.py). Rendering is a client
  * concern; these produce plottable DataFrames.
  */
object PlotData {

  private val singleNameRe = """^[A-Za-z_][A-Za-z0-9_]*$|^`[^`]+`$""".r
  private val nameTokenRe = """`([^`]+)`|\b([A-Za-z_][A-Za-z0-9_]*)\b""".r

  /** Names DataFrame.eval resolves itself — never zero-filled
    * (reference: _plotting.py:30-58). */
  val evalReserved: Set[String] = Set(
    "and", "or", "not", "in", "is", "if", "else", "True", "False", "None",
    "abs", "sqrt", "log", "log10", "log1p", "exp", "sin", "cos", "tan",
    "arcsin", "arccos", "arctan", "sinh", "cosh", "tanh", "where", "arctan2")

  /** Identifiers referenced in an expression
    * (reference: _referenced_names, _plotting.py:61-68). */
  def referencedNames(e: String): Set[String] =
    nameTokenRe.findAllMatchIn(e).flatMap { m =>
      val backtick = Option(m.group(1))
      val ident = Option(m.group(2))
      backtick.orElse(ident.filterNot(evalReserved.contains))
    }.toSet

  /** X5: evaluate a plot-axis expression against `df`
    * (reference: BasePlot._eval, _plotting.py:211-250).
    *
    * - an exact column name (however exotic, e.g. `Al{3+}`) matches
    *   directly with no escaping;
    * - otherwise the expression is parsed by Spark SQL (`expr`), with
    *   names missing from the frame substituted as 0.0 — but a single
    *   missing name still raises, like the reference.
    */
  def evalExpr(df: DataFrame, e: String): Column = {
    val stripped = e.trim
    if (df.columns.contains(stripped)) col(stripped)
    else if (singleNameRe.findFirstIn(stripped).isDefined) {
      // single identifier not present as a column -> resolution error
      val name = stripped.stripPrefix("`").stripSuffix("`")
      require(df.columns.contains(name), s"column not found: $name")
      col(name)
    } else {
      val missing = referencedNames(stripped) -- df.columns
      val substituted = missing.foldLeft(stripped) { (acc, name) =>
        // replace bare or backticked references with a 0.0 literal
        acc.replace(s"`$name`", "(0.0d)")
          .replaceAll(s"\\b${java.util.regex.Pattern.quote(name)}\\b", "(0.0d)")
      }
      expr(substituted)
    }
  }

  private val xScale = 1.0 / math.sqrt(3.0)

  /** Ternary barycentric projection: fractions + (x, y) plane coords
    * (reference: _project, _plotting.py:320-346). Scale-invariant. */
  def ternary(df: DataFrame, top: String, left: String, right: String,
      carry: Seq[String] = Nil): DataFrame = {
    val t = evalExpr(df, top); val l = evalExpr(df, left); val r = evalExpr(df, right)
    val denom = t + l + r
    val ft = t / denom; val fl = l / denom; val fr = r / denom
    df.select(carry.map(col) ++ Seq(
      ft.as("f_top"), fl.as("f_left"), fr.as("f_right"),
      ((fr - fl) * xScale).as("x"), ft.as("y")): _*)
  }

  /** Population variance (reference: _variance, _plotting.py:843-848). */
  def variance(values: Seq[Double]): Double =
    if (values.length < 2) 0.0
    else {
      val mean = values.sum / values.length
      values.map(v => (v - mean) * (v - mean)).sum / values.length
    }

  /** G6: optimal 2-way partition of columns by mean value, minimizing
    * summed within-group variance — contiguous split of sorted means
    * (1-D Jenks; reference: ProfilePlot._auto_split,
    * _plotting.py:1145-1192). Column means come from ONE aggregate pass
    * over the union of groups; the O(n) split runs on the driver over
    * at most a few dozen column means. Returns the secondary-axis set. */
  def autoSplit(groups: Seq[DataFrame], candidates: Option[Seq[String]] = None): Set[String] = {
    val allCols = {
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      groups.foreach(_.columns.foreach(seen += _))
      seen.toSeq
    }
    val order = candidates.getOrElse(allCols)
    // ONE aggregate job over the tagged union of all groups, not one job
    // per group: a column missing from a group unions in as NULL, which
    // sum/count skip — identical accumulation to per-group aggregates,
    // at 1/N the job-scheduling cost (matters when profiles have many
    // mineral groups, and at scale each job is a full stage).
    val sums = scala.collection.mutable.Map.empty[String, (Double, Long)]
    val relevant = groups.map { g =>
      val cols = g.columns.filter(order.contains).toSeq
      g -> cols
    }.filter(_._2.nonEmpty)
    if (relevant.nonEmpty) {
      val unioned = relevant.map { case (g, cols) => g.select(cols.map(col): _*) }
        .reduce(_.unionByName(_, allowMissingColumns = true))
      val cols = unioned.columns.toSeq
      val aggs = cols.flatMap(c => Seq(sum(col(c)).as(s"s_$c"), count(col(c)).as(s"c_$c")))
      val row = unioned.agg(aggs.head, aggs.tail: _*).collect()(0)
      cols.zipWithIndex.foreach { case (c, i) =>
        val s = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
        val n = row.getLong(2 * i + 1)
        sums(c) = (s, n)
      }
    }
    val means = order.flatMap { c =>
      sums.get(c).collect { case (s, n) if n > 0 => c -> s / n }
    }.toMap
    val columns = order.filter(means.contains)
    if (columns.length < 2) return Set.empty
    // secondary sort by name so exact mean ties order identically to the
    // SQL mirror's ORDER BY m, col_name (p82 oracle)
    val sortedCols = columns.sortBy(c => (means(c), c))
    var best: Option[Double] = None
    var bestB = Set.empty[String]
    for (k <- 1 until sortedCols.length) {
      val a = sortedCols.take(k).toSet
      val b = sortedCols.drop(k).toSet
      val v = variance(a.toSeq.map(means)) + variance(b.toSeq.map(means))
      if (best.forall(v < _)) {
        best = Some(v)
        bestB = if (a.contains(columns.head)) b else a
      }
    }
    bestB
  }

  /** P2: canonical-order oxide projection (reference:
    * _accessors.py:253-262 + _sort_oxide_columns). */
  def sortedOxides(df: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val schema = ChemSchema.of(df)
    val ordered = graft.chem.Chem.sortOxideColumns(schema.oxideCols)
    df.select(carry.map(col) ++ ordered.map(col): _*)
  }
}
