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

  // ---- ternary axis geometry (reference: _plotting.py:324-612) -------------
  // Driver-side plot scaffolding: these run over polygon vertex lists of
  // at most ~6 points (the clipped triangle), never over data rows — the
  // data-plane reduction is [[ternary]] above.

  private val geomEps = 1e-9

  /** Scalar barycentric projection (reference: _project, _plotting.py:324).
    * Scale-invariant like [[ternary]]. */
  def projectPoint(t: Double, left: Double, r: Double): (Double, Double) = {
    val denom = t + left + r
    ((r / denom - left / denom) * xScale, t / denom)
  }

  private def interpolateV(p1: Vector[Double], p2: Vector[Double], key: Int,
      bound: Double): Vector[Double] = {
    val frac = (bound - p1(key)) / (p2(key) - p1(key))
    p1.zip(p2).map { case (a, b) => a + frac * (b - a) }
  }

  /** One Sutherland-Hodgman pass clipping to `v(key) >= bound` (or `<=`)
    * (reference: _clip_polygon, _plotting.py:361). */
  private def clipPolygon(vs: Seq[Vector[Double]], key: Int, bound: Double,
      keepGe: Boolean): Seq[Vector[Double]] = {
    if (vs.isEmpty) return vs
    def in(v: Vector[Double]) = if (keepGe) v(key) >= bound else v(key) <= bound
    val n = vs.length
    val out = Seq.newBuilder[Vector[Double]]
    for (i <- 0 until n) {
      val curr = vs(i)
      val prev = vs((i - 1 + n) % n)
      if (in(curr)) {
        if (!in(prev)) out += interpolateV(prev, curr, key, bound)
        out += curr
      } else if (in(prev)) out += interpolateV(prev, curr, key, bound)
    }
    out.result()
  }

  /** Visible-region vertices as (t, left, r) in boundary order, exactly
    * clipped to the axis limits (reference: _polygon_vertices,
    * _plotting.py:382). */
  def polygonVertices(tlim: Option[(Double, Double)],
      llim: Option[(Double, Double)], rlim: Option[(Double, Double)],
      ternarySum: Double): Seq[Vector[Double]] = {
    var vs: Seq[Vector[Double]] = Seq(
      Vector(ternarySum, 0.0, 0.0),
      Vector(0.0, 0.0, ternarySum),
      Vector(0.0, ternarySum, 0.0))
    Seq((0, tlim), (1, llim), (2, rlim)).foreach { case (key, lim) =>
      lim.foreach { case (vmin, vmax) =>
        vs = clipPolygon(vs, key, vmin, keepGe = true)
        vs = clipPolygon(vs, key, vmax, keepGe = false)
      }
    }
    vs
  }

  /** MaxNLocator(nbins=5)-equivalent nice ticks, filtered to
    * [vmin, vmax] (reference: _nice_ticks, _plotting.py:413): candidate
    * steps 1/2/2.5/5/10 scaled to the range's magnitude, smallest step
    * producing at most nbins intervals. */
  def niceTicks(vmin: Double, vmax: Double, nbins: Int = 5): Seq[Double] = {
    require(vmax > vmin, s"niceTicks needs vmax > vmin, got [$vmin, $vmax]")
    val rawStep = (vmax - vmin) / nbins
    val mag = math.pow(10, math.floor(math.log10(rawStep)))
    val steps = Seq(1.0, 2.0, 2.5, 5.0, 10.0).map(_ * mag)
    val step = steps.find(s => (vmax - vmin) / s <= nbins + geomEps)
      .getOrElse(steps.last)
    val first = math.floor(vmin / step) * step
    Iterator.from(0).map(i => first + i * step)
      .takeWhile(_ <= vmax + step)
      .filter(v => v >= vmin - geomEps && v <= vmax + geomEps)
      .map(v => if (math.abs(v) < geomEps) 0.0 else v)
      .toSeq
  }

  // Tick-ownership convention (reference: _OWNER_MIN/_OWNER_MAX,
  // _plotting.py:426-427): the edge where barycentric key k is at its
  // minimum shows ticks for ownerMin(k); at its maximum, ownerMax(k).
  private val ownerMin = Map(0 -> 2, 1 -> 0, 2 -> 1)
  private val ownerMax = Map(0 -> 1, 1 -> 2, 2 -> 0)

  private def unit(dx: Double, dy: Double): (Double, Double) = {
    val len = math.hypot(dx, dy)
    (dx / len, dy / len)
  }

  // full-triangle vertex projections: T, L, R
  private val vT = (0.0, 1.0)
  private val vL = (-xScale, 0.0)
  private val vR = (xScale, 0.0)

  // ticks for axis k are drawn parallel to the side OPPOSITE k's vertex
  // (reference: _TICK_DIRECTION, _plotting.py:457)
  private val tickDir: Map[Int, (Double, Double)] = Map(
    0 -> unit(vR._1 - vL._1, vR._2 - vL._2),
    1 -> unit(vR._1 - vT._1, vR._2 - vT._2),
    2 -> unit(vL._1 - vT._1, vL._2 - vT._2))

  private def polygonCentroid(polygon: Seq[Vector[Double]]): (Double, Double) = {
    val pts = polygon.map(v => projectPoint(v(0), v(1), v(2)))
    (pts.map(_._1).sum / pts.length, pts.map(_._2).sum / pts.length)
  }

  /** Unit normal of edge (x1,y1)-(x2,y2) pointing away from `centroid`
    * (reference: _edge_outward_normal, _plotting.py:466). */
  private def edgeOutwardNormal(x1: Double, y1: Double, x2: Double, y2: Double,
      centroid: (Double, Double)): (Double, Double) = {
    val (edx, edy) = (x2 - x1, y2 - y1)
    if (math.hypot(edx, edy) < geomEps) return (0.0, 0.0)
    var (nx, ny) = unit(-edy, edx)
    val (mx, my) = ((x1 + x2) / 2, (y1 + y2) / 2)
    if (nx * (mx - centroid._1) + ny * (my - centroid._2) < 0) { nx = -nx; ny = -ny }
    (nx, ny)
  }

  private def outwardTickDirection(key: Int,
      edgeNormal: (Double, Double)): (Double, Double) = {
    val (dx, dy) = tickDir(key)
    if (dx * edgeNormal._1 + dy * edgeNormal._2 < 0) (-dx, -dy) else (dx, dy)
  }

  /** Tick positions for one axis on its owning polygon edges
    * (reference: _axis_ticks, _plotting.py:545): one
    * ((x, y), value, (dx, dy)) per nice tick value, where (dx, dy) is
    * the outward-oriented tick/label direction. Handles an axis whose
    * scale is split across two edges by a different axis's limit. */
  def axisTicks(polygon: Seq[Vector[Double]], key: Int, vmin: Double,
      vmax: Double): Seq[((Double, Double), Double, (Double, Double))] = {
    val n = polygon.length
    val globalMin = (0 until 3).map(k => polygon.map(_(k)).min)
    val globalMax = (0 until 3).map(k => polygon.map(_(k)).max)
    val centroid = polygonCentroid(polygon)
    val nice = niceTicks(vmin, vmax)
    val found = scala.collection.mutable.LinkedHashMap
      .empty[Double, ((Double, Double), (Double, Double))]
    for (i <- 0 until n) {
      val v1 = polygon(i)
      val v2 = polygon((i + 1) % n)
      (0 until 3).find(k => math.abs(v1(k) - v2(k)) < geomEps).foreach { edgeKey =>
        val constVal = v1(edgeKey)
        val owner =
          if (math.abs(constVal - globalMin(edgeKey)) < geomEps) Some(ownerMin(edgeKey))
          else if (math.abs(constVal - globalMax(edgeKey)) < geomEps) Some(ownerMax(edgeKey))
          else None
        if (owner.contains(key)) {
          val (x1, y1) = projectPoint(v1(0), v1(1), v1(2))
          val (x2, y2) = projectPoint(v2(0), v2(1), v2(2))
          val normal = edgeOutwardNormal(x1, y1, x2, y2, centroid)
          val direction = outwardTickDirection(key, normal)
          val lo = math.min(v1(key), v2(key))
          val hi = math.max(v1(key), v2(key))
          nice.foreach { value =>
            val rounded = math.rint(value * 1e6) / 1e6
            if (lo - geomEps <= value && value <= hi + geomEps &&
                !found.contains(rounded)) {
              val point =
                if (math.abs(v2(key) - v1(key)) < geomEps) v1
                else interpolateV(v1, v2, key, value)
              found(rounded) = (projectPoint(point(0), point(1), point(2)), direction)
            }
          }
        }
      }
    }
    nice.flatMap { v =>
      found.get(math.rint(v * 1e6) / 1e6).map { case (xy, dir) => (xy, v, dir) }
    }
  }
}
