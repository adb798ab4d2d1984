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
    // doesn't), so they are rows-only exactly while uncaptured;
    // dd_embed_lsh likewise — its replay interpolates the corpus-sized
    // (bits, tables) captured at query execution.
    // snapshot the three generated maps ONCE and derive both sides from
    // it — reading the volatile capture state twice would flake if a
    // concurrently running suite executes a kmeans/IVF/LSH query between
    // the reads
    val centroid = Queries.centroidOracle
    val ivf = Queries.ivfOracle
    val lsh = Queries.lshOracle
    val oracled = Queries.staticOracle.keySet ++ centroid.keySet ++ ivf.keySet ++ lsh.keySet
    val rowsOnly = Queries.catalog.keySet.diff(oracled)
    val declared =
      (Set("dd_semdedup", "emb_kmeans", "dd_semdedup_verdicts",
        "dd_semdedup_fixed") -- centroid.keySet) ++
      (Set("ann_ivf", "ann_ivf_knn") -- ivf.keySet) ++
      (Set("ann_lsh", "dd_embed_lsh") -- lsh.keySet)
    assert(rowsOnly == declared,
      s"rows-only set drifted: extra=${rowsOnly.diff(declared)} missing=${declared.diff(rowsOnly)}")
  }

  test("oracle SQL contains no statement separators") {
    Queries.oracle.foreach { case (name, sql) =>
      assert(!sql.contains(";"), s"$name oracle must be a single statement")
    }
  }
}
