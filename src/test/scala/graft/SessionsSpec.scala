package graft

/** Pins the shared session configuration every serving entry point
  * (Serve, Bench, LoadProbe) builds through [[Sessions.serviceBuilder]].
  * The set exists because each config was measured as load-bearing; a
  * drive-by edit that drops one must fail here, not in a bench round.
  */
class SessionsSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("ServiceConfs carries the benched load-bearing configs") {
    val m = Sessions.ServiceConfs.toMap
    assert(m("spark.sql.adaptive.enabled") == "true")
    assert(m("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(m("spark.sql.codegen.cache.maxEntries") == "3000",
      "the default 100-entry codegen cache thrashes under the ~67-query catalog")
    assert(m("spark.scheduler.mode") == "FAIR",
      "concurrent requests must share the pool, not FIFO-starve")
  }

  test("reducer counts come from data size: AQE starts at 8x cores and " +
      "coalesces down (the r17 500M-event decade measured the static " +
      "knob sorting 15.6M rows/reducer: 552s vs 246-363s)") {
    assert(Sessions.initialPartitions("32") == "256")
    assert(Sessions.initialPartitions("8") == "64")
    val m = Sessions.serviceConfPairs("32").toMap
    assert(m.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
      .contains("256"), "the posture must reach every serving session")
  }

  test("serviceConfPairs (what serviceBuilder applies) covers drift + service + parallelism") {
    val m = Sessions.serviceConfPairs("32").toMap
    Sessions.DriftConfs.foreach { case (k, v) =>
      assert(m.get(k).contains(v), s"drift defense $k=$v must reach the serving session")
    }
    Sessions.ServiceConfs.foreach { case (k, v) =>
      assert(m.get(k).contains(v), s"service conf $k=$v must reach the serving session")
    }
    assert(m.get("spark.sql.shuffle.partitions").contains("32"),
      "shuffle parallelism must match the core count")
  }
}
