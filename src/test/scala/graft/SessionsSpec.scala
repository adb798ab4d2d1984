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
