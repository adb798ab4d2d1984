package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.JetFunctions

/** J4/J5 — jet-drop prev/next linkage.
  *
  * Two flavours in the reference:
  *  - by id (J4, `etl/storage/storage.go:496-531`): the drops at pulse±1
  *    whose jet id is in {jet, jet+"0", jet+"1", parent(jet)}.
  *  - by hash (J5, `api/handlers.go:207-297`): a drop's prev are the drops
  *    whose `hash` equals one of my two prev hashes; its next are the drops
  *    whose `first_prev_hash` equals my hash.
  *
  * Both are equi-joins against a page-sized left side, so the enrichment
  * side is built from ONLY the adjacent pulses (partition-pruned scan) and
  * the join broadcasts the page — no full-table shuffle at any scale.
  */
object JetLinkage {

  /** J4 — point lookup of sibling drops around (pulse, jetId).
    * `pulseDelta` is the spacing between consecutive pulses: 1 for the
    * hourly [[graft.model.Domain]] views, 10 for the reference-cadence
    * fixtures (`testutils/models.go:16`).
    */
  def siblingsAround(jetDrops: DataFrame, pulse: Long, jetId: String,
      pulseDelta: Long = 1L): DataFrame = {
    val cands = JetFunctions.jetLinkCandidates(jetId)
    jetDrops.filter(
      (col("pulse_number") === pulse - pulseDelta ||
        col("pulse_number") === pulse + pulseDelta) &&
        col("jet_id").isin(cands: _*))
  }

  /** J5 — enrich a page of drops with the prev/next jet-drop ID LISTS via
    * hash linkage, matching `api/handlers.go:207-297` (`createNextPrevMaps`
    * 269-297): a drop's next are the neighbor drops whose `first_prev_hash`
    * equals my `hash`; its prev are the neighbor drops whose `hash` equals
    * one of my two prev hashes. Lists come back as comma-joined sorted
    * `jet_drop_id` strings (deterministic, oracle-hashable), empty string
    * when none. Both inputs must expose (jet_drop_id, hash,
    * first_prev_hash, second_prev_hash); `neighbors` should be the drops
    * of the page's pulse span ±1 (partition-pruned scan) and is broadcast
    * against the page.
    */
  def hashLinkIds(page: DataFrame, neighbors: DataFrame): DataFrame = {
    // next-links key by first_prev_hash ONLY, deliberately: the
    // reference's own next map does the same — its
    // `add(jetDrop.SecondPrevHash)` is COMMENTED OUT in
    // `api/handlers.go:296` — so a merge drop's second parent never
    // lists the merged child as next there either. Faithful quirk, not
    // an omission (prev-links still carry both parents).
    val n = neighbors.select(col("jet_drop_id").as("_nid"), col("hash").as("_nh"),
      col("first_prev_hash").as("_nfp"))
    // Both link relations resolve in ONE aggregation pass: tag each
    // broadcast-join match by direction, union, and split with
    // conditional collect_lists (collect_list drops nulls) — a single
    // shuffle of the page instead of two sequential groupBys.
    val pageCols = page.columns.map(col)
    val nextRows = page.join(broadcast(n), col("hash") === col("_nfp"), "left")
      .select(pageCols :+ lit("n").as("_kind") :+ col("_nid"): _*)
    // The prev relation is "my first OR second prev hash equals the
    // neighbor's hash". An OR of equi-conditions cannot hash-join (Spark
    // degrades to BroadcastNestedLoopJoin — every page row scans every
    // neighbor row), so explode the two prev hashes into one key column
    // and join on a single equality. `array_distinct` preserves the OR's
    // match multiplicity when the two prev hashes coincide (the
    // two-parent merge branch): the OR matched such a neighbor once.
    val prevRows = page
      .withColumn("_pk",
        explode(array_distinct(array(col("first_prev_hash"), col("second_prev_hash")))))
      .join(broadcast(n), col("_pk") === col("_nh"), "left")
      .select(pageCols :+ lit("p").as("_kind") :+ col("_nid"): _*)
    nextRows.unionByName(prevRows)
      .groupBy(pageCols: _*)
      .agg(
        array_join(sort_array(collect_list(when(col("_kind") === "n", col("_nid")))), ",")
          .as("next_ids"),
        array_join(sort_array(collect_list(when(col("_kind") === "p", col("_nid")))), ",")
          .as("prev_ids"))
  }

  /** J5 — enrich a page of drops with prev/next counts via hash linkage.
    * `page` and `neighbors` must both expose (pulse_number, jet_id, hash,
    * first_prev_hash, second_prev_hash). Returns the page with
    * `prev_count`/`next_count` columns (the API materializes ids; counts
    * keep the shape testable without array columns).
    */
  def hashLinkCounts(page: DataFrame, neighbors: DataFrame): DataFrame = {
    val nexts = neighbors.select(col("first_prev_hash").as("_nh")).filter(col("_nh").isNotNull)
    val prevs = neighbors.select(col("hash").as("_ph")).filter(col("_ph").isNotNull)

    val withNext = page.join(broadcast(nexts), col("hash") === col("_nh"), "left")
      .groupBy(page.columns.map(col): _*)
      .agg(count(col("_nh")).as("next_count"))
    // Same equi-join rewrite as [[hashLinkIds]]: explode the two prev
    // hashes (deduplicated, so a merge drop whose parents share a hash
    // still counts each matching neighbor once) instead of an OR
    // predicate that would plan a BroadcastNestedLoopJoin.
    withNext
      .withColumn("_pk",
        explode(array_distinct(array(col("first_prev_hash"), col("second_prev_hash")))))
      .join(broadcast(prevs), col("_pk") === col("_ph"), "left")
      .groupBy(withNext.columns.map(col): _*)
      .agg(count(col("_ph")).as("prev_count"))
  }
}
