package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that need no SparkSession: every oracle key
  * must name a catalog query (an orphan oracle would make the driver's
  * DuckDB pass fail on a missing parquet dump), and oracle SQL must stay
  * single-statement ANSI-ish text the dump layer can JSON-escape.
  */
class CatalogContractSpec extends AnyFunSuite {

  test("every oracle key has a catalog query") {
    val orphans = Queries.oracle.keySet.diff(Queries.catalog.keySet)
    assert(orphans.isEmpty, s"oracle entries without a catalog query: $orphans")
  }

  test("oracled coverage stays at the declared level") {
    // rows-only queries are the deliberate exceptions (seeded hash
    // families, approximations); everything else must keep its oracle so
    // the driver's correctness gate stays strong. emb_kmeans/dd_semdedup
    // gain a generated centroid-literal oracle once the kmeans family has
    // executed in this JVM (Verify's order guarantees it; suite order here
    // doesn't), so they are rows-only exactly while uncaptured.
    val rowsOnly = Queries.catalog.keySet.diff(Queries.oracle.keySet)
    val declared = Set("ev_sketch") ++
      (Set("dd_semdedup", "emb_kmeans", "dd_semdedup_verdicts",
        "dd_semdedup_fixed") -- Queries.centroidOracle.keySet) ++
      (Set("ann_ivf", "ann_ivf_knn") -- Queries.ivfOracle.keySet) ++
      (Set("ann_lsh") -- Queries.lshOracle.keySet)
    assert(rowsOnly == declared,
      s"rows-only set drifted: extra=${rowsOnly.diff(declared)} missing=${declared.diff(rowsOnly)}")
  }

  test("oracle SQL contains no statement separators") {
    Queries.oracle.foreach { case (name, sql) =>
      assert(!sql.contains(";"), s"$name oracle must be a single statement")
    }
  }
}
