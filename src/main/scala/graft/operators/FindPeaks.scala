package graft.operators

/**
 * Pure-Scala port of the published `scipy.signal.find_peaks` algorithm
 * (the reference cites the scipy docs itself, metevents/events.py:206-207;
 * semantics follow the documented behavior of scipy's
 * `_local_maxima_1d`, `peak_prominences`, and `peak_widths`):
 *
 *  - local maxima with plateau handling: a flat top reports its
 *    midpoint sample `(left_edge + right_edge) / 2` (integer division);
 *    the first and last samples can never be peaks;
 *  - prominence: walk outward from the peak until a strictly higher
 *    sample (or the signal edge); the base is the minimum in that
 *    window; prominence = peak − max(left_min, right_min);
 *  - width: measured at `peak_height − prominence · rel_height`
 *    (rel_height = 0.5), walking from the peak toward each base and
 *    linearly interpolating the crossing.
 *
 * NaN discipline matches C-float comparisons (and hence numpy): any
 * comparison with NaN is false, so NaN samples never form peaks and
 * terminate plateau scans. Missing values should be encoded as NaN
 * before calling.
 *
 * Selection order mirrors find_peaks: height → threshold → prominence
 * → width (`distance` is not exposed — the reference never passes it,
 * metevents/events.py:222-236).
 */
object FindPeaks {

  /** One kept peak: `midpoint` sample index and its measured `width`
    * in samples (fractional, interpolated). */
  final case class Peak(midpoint: Int, width: Double, prominence: Double)

  final case class Params(
      height: Option[Double] = None,
      threshold: Option[Double] = None,
      prominence: Option[Double] = Some(100.0),
      widthMin: Double = 0.0,
      widthMax: Double = 3.0,
      relHeight: Double = 0.5)

  /** Local maxima midpoints with plateau handling (scipy
    * `_local_maxima_1d`): for a rising edge at i, scan the plateau of
    * equal samples; it is a peak iff the sample after the plateau is
    * strictly lower. Also returns plateau edges (unused downstream but
    * kept for parity-testing). */
  private[graft] def localMaxima(x: Array[Double]): Array[Int] = {
    val out = Array.newBuilder[Int]
    val iMax = x.length - 1
    var i = 1
    while (i < iMax) {
      if (x(i - 1) < x(i)) {
        var iAhead = i + 1
        while (iAhead < iMax && x(iAhead) == x(i)) iAhead += 1
        if (x(iAhead) < x(i)) {
          val leftEdge = i
          val rightEdge = iAhead - 1
          out += (leftEdge + rightEdge) / 2
          i = iAhead
        }
      }
      i += 1
    }
    out.result()
  }

  private[graft] final case class Prominence(
      value: Double, leftBase: Int, rightBase: Int)

  /** scipy `peak_prominences` with unrestricted window (wlen unset —
    * the reference never passes wlen). */
  private[graft] def prominences(x: Array[Double], peaks: Array[Int]): Array[Prominence] =
    peaks.map { p =>
      val ph = x(p)
      var i = p
      var leftMin = ph
      var leftBase = p
      while (i >= 0 && x(i) <= ph) {
        if (x(i) < leftMin) { leftMin = x(i); leftBase = i }
        i -= 1
      }
      i = p
      var rightMin = ph
      var rightBase = p
      while (i <= x.length - 1 && x(i) <= ph) {
        if (x(i) < rightMin) { rightMin = x(i); rightBase = i }
        i += 1
      }
      Prominence(ph - math.max(leftMin, rightMin), leftBase, rightBase)
    }

  /** scipy `peak_widths` at rel_height, bounded by the prominence
    * bases, with linear interpolation of the crossing points. */
  private[graft] def width(
      x: Array[Double], peak: Int, prom: Prominence, relHeight: Double): Double = {
    val h = x(peak) - prom.value * relHeight
    var i = peak
    while (prom.leftBase < i && h < x(i)) i -= 1
    var leftIp = i.toDouble
    if (x(i) < h) leftIp += (h - x(i)) / (x(i + 1) - x(i))
    i = peak
    while (i < prom.rightBase && h < x(i)) i += 1
    var rightIp = i.toDouble
    if (x(i) < h) rightIp -= (h - x(i)) / (x(i - 1) - x(i))
    rightIp - leftIp
  }

  /** find_peaks: returns kept peaks with their measured widths, in
    * ascending midpoint order. */
  def findPeaks(x: Array[Double], params: Params): Array[Peak] = {
    if (x.length < 3) return Array.empty
    var peaks = localMaxima(x)
    params.height.foreach { hMin =>
      peaks = peaks.filter(p => x(p) >= hMin)
    }
    params.threshold.foreach { tMin =>
      // vertical distance to both neighbors must be >= tMin
      peaks = peaks.filter(p => math.min(x(p) - x(p - 1), x(p) - x(p + 1)) >= tMin)
    }
    var proms = prominences(x, peaks)
    params.prominence.foreach { pMin =>
      val keep = proms.map(_.value >= pMin)
      peaks = peaks.zip(keep).collect { case (p, true) => p }
      proms = proms.zip(keep).collect { case (p, true) => p }
    }
    val widths = peaks.indices.map(i => width(x, peaks(i), proms(i), params.relHeight))
    peaks.indices.iterator
      .filter(i => params.widthMin <= widths(i) && widths(i) <= params.widthMax)
      .map(i => Peak(peaks(i), widths(i), proms(i).value))
      .toArray
  }

  /**
   * The reference's mask painting (metevents/events.py:238-247): for
   * each peak/valley midpoint p with width w, flag samples
   * `[int(p−w), int(p+w)]` inclusive (Python `iloc[p1 : p2+1)`; `int`
   * truncates toward zero). The reference's latent negative-index
   * wrap-around (`iloc[-k:]` when p−w < −1) is NOT reproduced — we
   * clamp to the series start (SURVEY.md §7.1/L4; the flv goldens
   * never hit it).
   *
   * Valleys come from the sign-flipped series (events.py:230-235).
   * Returns the flagged boolean mask.
   */
  def spikeValleyMask(x: Array[Double], params: Params): Array[Boolean] = {
    val mask = new Array[Boolean](x.length)
    def paint(peaks: Array[Peak]): Unit = peaks.foreach { pk =>
      val p1 = math.max((pk.midpoint - pk.width).toInt, 0)
      val p2 = math.min((pk.midpoint + pk.width).toInt, x.length - 1)
      var i = p1
      while (i <= p2) { mask(i) = true; i += 1 }
    }
    paint(findPeaks(x, params))
    paint(findPeaks(x.map(v => -v), params))
    mask
  }
}
