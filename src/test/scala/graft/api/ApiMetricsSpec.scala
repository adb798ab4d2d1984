package graft.api

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the metrics primitives themselves — HttpApiSpec proves
  * the `/metrics` endpoint end to end; these pin the Summary ring's
  * windowing semantics (exact count/sum forever, quantiles over the last
  * `capacity` observations only) that the endpoint test cannot see.
  */
class ApiMetricsSpec extends AnyFunSuite {

  test("Summary quantiles are order statistics of what was recorded") {
    val s = new ApiMetrics.Summary(capacity = 8)
    Seq(10L, 20L, 30L, 40L).foreach(n => s.record(n * 1000000L)) // ms in nanos
    val q = s.quantiles(Seq(0.0, 0.5, 0.99)).toMap
    assert(q(0.0) == 0.010)
    // nearest-rank: ceil(0.5*4)-1 = index 1 of [10,20,30,40] — the
    // truncating (q*n).toInt form would report 30, one rank too high
    // (and the median of a 2-sample window as its max)
    assert(q(0.5) == 0.020)
    assert(q(0.99) == 0.040)
    assert(s.count.sum() == 4)
    assert(s.sumNanos.sum() == 100L * 1000000L)
  }

  test("Summary ring holds only the last `capacity` observations; count/sum stay exact") {
    val s = new ApiMetrics.Summary(capacity = 4)
    // 4 slow then 4 fast: the slow ones must age out of the quantile window
    Seq(900L, 900L, 900L, 900L, 1L, 2L, 3L, 4L).foreach(n => s.record(n * 1000000L))
    val q = s.quantiles(Seq(0.99)).toMap
    assert(q(0.99) == 0.004, "p99 must reflect the recent window, not the aged-out slow burst")
    assert(s.count.sum() == 8, "exact lifetime count survives the window")
    assert(s.sumNanos.sum() == (900L * 4 + 10L) * 1000000L)
  }

  test("empty Summary renders no quantile rows (NaN guarded)") {
    val s = new ApiMetrics.Summary(capacity = 4)
    assert(s.quantiles(Seq(0.5)).forall(_._2.isNaN))
    val metrics = new ApiMetrics
    metrics.record("/r", 200, 5000000L)
    val text = metrics.render()
    assert(text.contains("""gbe_api_requests_total{route="/r",status="200"} 1"""))
    assert(!text.contains("NaN"))
  }
}
