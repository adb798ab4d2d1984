package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A node in a per-group linked chain. `prevKey == null` (or pointing
  * outside the group) marks the head. `chained=false` rows (the reference's
  * non-state records) pass through after the chain, ordered by `orderHint`.
  */
final case class ChainNode(
    key: String,
    groupKey: String,
    prevKey: String,
    chained: Boolean,
    orderHint: Long
)

final case class ChainedOut(key: String, groupKey: String, chainPos: Int)

/** J6 — per-object topological chain sort.
  *
  * Within one group (reference: the state records of one object inside one
  * jet drop, `etl/transformer/transformer.go:86-159`), records form a singly
  * linked list via `prev_record_reference`. The head is the record whose
  * prev pointer is absent or points outside the group; the causal order is
  * obtained by following the chain. Non-state records pass through after the
  * chain in `orderHint` order. Error semantics mirror the reference
  * (transformer.go:59-63, 108-125): a group with no head, more than one
  * head, a cycle/broken link, or a length mismatch is DROPPED whole (the
  * reference logs and skips the jet drop).
  *
  * Not expressible as SQL (arbitrary-depth pointer chasing), so this is the
  * one genuinely imperative operator: `groupByKey.flatMapGroups` over a
  * typed Dataset. Scale: groups are the records of ONE object in ONE ~10s
  * pulse — tiny by construction — while the number of groups is huge, which
  * is exactly the shape `flatMapGroups` distributes well (one shuffle on the
  * group key, then embarrassingly parallel per-group work; no skew risk
  * because group size is bounded by the pulse window).
  */
object ChainSort {

  /** Sort one group; None = broken group (dropped by the caller). */
  def sortGroup(nodes: Seq[ChainNode]): Option[Seq[ChainNode]] = {
    val (states, others) = nodes.partition(_.chained)
    val sortedOthers = others.sortBy(n => (n.orderHint, n.key))
    if (states.isEmpty) return Some(sortedOthers)

    val keys = states.map(_.key).toSet
    if (keys.size != states.size) return None // duplicate keys
    val byPrev = new scala.collection.mutable.HashMap[String, ChainNode]
    val heads = scala.collection.mutable.ArrayBuffer.empty[ChainNode]
    states.foreach { n =>
      if (n.prevKey == null || n.prevKey.isEmpty || !keys.contains(n.prevKey)) heads += n
      else if (byPrev.put(n.prevKey, n).isDefined) return None // two records share a prev
    }
    if (heads.size != 1) return None // no head or forked chain
    val out = scala.collection.mutable.ArrayBuffer.empty[ChainNode]
    var cur: ChainNode = heads.head
    while (cur != null && out.size <= states.size) {
      out += cur
      cur = byPrev.getOrElse(cur.key, null)
    }
    if (out.size != states.size) None // cycle or unreachable tail
    else Some(out.toSeq ++ sortedOthers)
  }

  /** Distributed chain sort: emits (key, groupKey, 1-based causal position).
    * Broken groups are dropped (reference semantics).
    */
  def apply(ds: Dataset[ChainNode]): Dataset[ChainedOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.groupKey)
      .flatMapGroups { (g, it) =>
        sortGroup(it.toSeq) match {
          case Some(sorted) =>
            sorted.iterator.zipWithIndex.map { case (n, i) => ChainedOut(n.key, g, i + 1) }
          case None => Iterator.empty
        }
      }
  }

  /** DataFrame adapter: `df` must expose string columns (key, group_key,
    * prev_key) and numeric order_hint; `chained` defaults to true.
    */
  def sortDf(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val withChained =
      if (df.columns.contains("chained")) df else df.withColumn("chained", lit(true))
    val ds = withChained.select(
      col("key").cast("string"),
      col("group_key").cast("string").as("groupKey"),
      col("prev_key").cast("string").as("prevKey"),
      col("chained").cast("boolean"),
      col("order_hint").cast("long").as("orderHint")
    ).as[ChainNode]
    apply(ds).toDF("key", "group_key", "chain_pos")
  }
}
