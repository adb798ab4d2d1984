package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Domain
import graft.functions.{Codecs, JetFunctions}
import graft.operators.{Pagination, Predicates, PulseChain}

/** The reference's eight read endpoints (`api/handlers.go`) as pure
  * functions SparkSession → params → DataFrame page: validate → build the
  * declarative query → present (SURVEY §3.2's four-layer shape, minus the
  * HTTP frame). Every function returns a bounded page; pagination inputs
  * are validated like `api/handlers.go:678-703`.
  */
object Endpoints {

  final case class PageParams(limit: Int = 20, offset: Int = 0) {
    require(Pagination.validLimit(limit), s"limit must be in [1,1000]: $limit")
    require(Pagination.validOffset(offset), s"offset must be >= 0: $offset")
  }

  private def views(spark: SparkSession, dir: String) = {
    val r = Domain.records(spark, dir)
    (r, Domain.jetDrops(r), Domain.pulses(r))
  }

  /** GET /pulses — list with recomputed chain links, newest first. */
  def pulses(spark: SparkSession, dir: String, page: PageParams = PageParams(),
      fromPulse: Option[Long] = None, toPulse: Option[Long] = None): DataFrame = {
    val (_, _, p) = views(spark, dir)
    val filtered = p.filter(Predicates.range(col("pulse_number"), gte = fromPulse, lte = toPulse))
    Pagination.page(PulseChain.repairChain(filtered),
      Seq(col("pulse_number").desc), page.limit, page.offset)
  }

  /** GET /pulses/{pulse} — point lookup. */
  def pulse(spark: SparkSession, dir: String, pulseNumber: Long): DataFrame = {
    val (_, _, p) = views(spark, dir)
    p.filter(col("pulse_number") === pulseNumber).limit(1)
  }

  /** GET /pulses/{pulse}/jet-drops — drops of one pulse, jet-id cursor. */
  def jetDropsByPulse(spark: SparkSession, dir: String, pulseNumber: Long,
      fromJetId: Option[String] = None, page: PageParams = PageParams()): DataFrame = {
    val (_, d, _) = views(spark, dir)
    val filtered = d.filter(col("pulse_number") === pulseNumber)
    val cursored = fromJetId.fold(filtered)(j => filtered.filter(col("jet_id") >= j))
    Mappers.jetDropToApi(
      Pagination.page(cursored, Seq(col("jet_id").asc), page.limit, page.offset))
  }

  /** GET /jet-drops/{jet_drop_id} — point lookup by "<jet>:<pulse>". */
  def jetDropById(spark: SparkSession, dir: String, jetDropId: String): Option[DataFrame] =
    Codecs.parseJetDropId(jetDropId).map { case (jet, pulse) =>
      val (_, d, _) = views(spark, dir)
      Mappers.jetDropToApi(
        d.filter(col("pulse_number") === pulse && col("jet_id") === jet).limit(1))
    }

  /** GET /jet-drops/{jet_drop_id}/records — records of one drop, keyset. */
  def jetDropRecords(spark: SparkSession, dir: String, jetDropId: String,
      fromIndex: Option[String] = None, page: PageParams = PageParams()): Option[DataFrame] =
    Codecs.parseJetDropId(jetDropId).map { case (jet, pulse) =>
      val (r, _, _) = views(spark, dir)
      val base = r.filter(col("pulse_number") === pulse && col("jet_id") === jet)
      val cursored = fromIndex.flatMap(Codecs.parseIndex).fold(base) { case (p, o) =>
        base.filter(Predicates.keysetFrom(col("pulse_number"), col("order"), p, o, asc = true))
      }
      Pagination.page(cursored,
        Seq(col("pulse_number").asc, col("order").asc, col("reference").asc),
        page.limit, page.offset)
    }

  /** GET /jet-drops/by-jet-id — subtree+ancestors over a pulse range,
    * mixed two-key sort (limit-only, default 1000, like the reference).
    */
  def jetDropsByJetId(spark: SparkSession, dir: String, jetPrefix: String,
      fromPulse: Option[Long] = None, toPulse: Option[Long] = None,
      pulseAsc: Boolean = true, limit: Int = 1000): DataFrame = {
    require(Pagination.validLimit(limit), s"limit must be in [1,1000]: $limit")
    val (_, d, _) = views(spark, dir)
    val filtered = d
      .filter(Predicates.range(col("pulse_number"), gte = fromPulse, lte = toPulse))
      .filter(JetFunctions.jetTreePredicate(col("jet_id"), jetPrefix))
    val sorted =
      if (pulseAsc) Seq(col("pulse_number").asc, col("jet_id").desc)
      else Seq(col("pulse_number").desc, col("jet_id").asc)
    Mappers.jetDropToApi(Pagination.page(filtered, sorted, limit))
  }

  /** GET /lifeline/{object_ref}/records — the object lifeline. */
  def objectLifeline(spark: SparkSession, dir: String, objectRef: Long,
      asc: Boolean = true, fromIndex: Option[String] = None,
      fromPulse: Option[Long] = None, toPulse: Option[Long] = None,
      page: PageParams = PageParams()): DataFrame = {
    val (r, _, _) = views(spark, dir)
    val base = r.filter(col("object_reference") === objectRef && col("type") === "state")
      .filter(Predicates.range(col("pulse_number"), gte = fromPulse, lte = toPulse))
    val cursored = fromIndex.flatMap(Codecs.parseIndex).fold(base) { case (p, o) =>
      base.filter(Predicates.keysetFrom(col("pulse_number"), col("order"), p, o, asc))
    }
    val sort =
      if (asc) Seq(col("pulse_number").asc, col("order").asc, col("reference").asc)
      else Seq(col("pulse_number").desc, col("order").desc, col("reference").desc)
    Pagination.page(cursored, sort, page.limit, page.offset)
  }

  /** GET /search — polymorphic dispatch to the matching point query. */
  def search(spark: SparkSession, dir: String, value: String): (String, DataFrame) =
    Search.dispatch(value) match {
      case Search.PulseTarget(p) => ("pulse", pulse(spark, dir, p))
      case Search.JetDropTarget(jet, p) =>
        ("jet_drop", jetDropById(spark, dir, s"${if (jet.isEmpty) "*" else jet}:$p").get)
      case Search.LifelineTarget(ref) =>
        // domain object refs are numeric user ids; a full deployment would
        // decode the 36-byte layout here
        ("lifeline", objectLifeline(spark, dir, java.nio.ByteBuffer.wrap(ref.takeRight(8)).getLong))
      case Search.RecordTarget(ref) =>
        val (r, _, _) = views(spark, dir)
        ("record", r.filter(col("reference") ===
          java.nio.ByteBuffer.wrap(ref.takeRight(8)).getLong).limit(1))
      case Search.NoMatch => ("none", spark.emptyDataFrame)
    }
}
