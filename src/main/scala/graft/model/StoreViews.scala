package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Serving views over an INGEST-WRITTEN store — the records/ jet_drops/
  * pulses/ layout the [[graft.Ingest]] daemon and
  * [[graft.ingest.PulseWriter]] maintain — so the HTTP API serves the
  * store the ETL wrote, exactly like the reference API reading the
  * Postgres tables its block-explorer binary populated (the loop the
  * reference's heavy_mock suites close, the `test/api` endpoint tests).
  *
  * [[graft.model.Domain]] routes `served*` here whenever `dir` is a
  * store ([[isStore]]); the testdata corpus path (views derived from
  * `events.parquet`) is untouched. The adapter maps the storage schema
  * ([[Schemas.records]]/[[Schemas.jetDrops]], plus the daemon's pulses
  * dimension) onto the column contract the [[graft.api.Endpoints]]
  * functions already serve:
  *
  *  - '''identity references become 64-bit keys''' (xxhash64 of the
  *    stored bytes, nulls preserved): the serving layer keys objects and
  *    records by long everywhere (the testdata domain's `event_id`/
  *    `user_id`), so the lifeline/search endpoints' long-keyed
  *    predicates work unchanged over a store. Content bytes (payload,
  *    hash) stay binary and render base64 at the JSON edge (F6).
  *  - '''drop hashes are derived''', md5 over (jet_id, pulse) with the
  *    parent pulse taken from the pulses CHAIN (a broadcast join against
  *    the tiny dimension), the same convention [[Domain.jetDrops]] uses —
  *    the store's write path does not persist content hashes (the
  *    reference's exporter supplies them on the wire; ours reserves the
  *    column).
  *  - `pulse_number` partition directories read back as their inferred
  *    integer type; every view casts it to LongType so predicates and
  *    JSON stay type-stable. Pulse-bounded endpoint predicates prune
  *    PARTITION DIRECTORIES on this layout — at 100 TB a pulse-bounded
  *    page lists a handful of directories instead of scanning anything.
  *
  * Reads are deliberately NOT relation-cached: a store is live (the
  * daemon appends pulses between requests), so each query re-resolves
  * the file listing — the pulses dimension is a directory of tiny
  * bucketed files and the fact reads are partition-pruned, so the
  * listing cost stays bounded by the predicate, not the history.
  *
  * Isolation contract: the parquet layout gives per-partition-commit
  * atomicity, not reader snapshots — a read that overlaps a maintainer
  * flush or a reload's partition overwrite of the SAME pulse can lose
  * its listed files mid-scan and surface as a retryable 500 (the
  * reference gets MVCC from Postgres here; StoreServeSpec's racing-
  * rewrite test pins that outcome set). One narrower window exists
  * beneath that: the dynamic-overwrite committer swaps each partition
  * directory by delete-then-rename, so a file LISTING landing inside
  * those two metadata ops (microseconds, vs the mid-scan window spanning
  * the whole read) sees the pulse's directory absent and would serve a
  * silently short page rather than a 500 — acceptable for this layout
  * because the write path touches only the one changing pulse and the
  * page heals on the next request, but it is the precise reason a
  * deployment needing overlap-free reads swaps the writer/reader pair
  * onto a snapshot-isolated table format (the layout is deliberately
  * directory-per-table to make that a drop-in), which is why this
  * adapter — not the endpoints — owns the physical reads.
  */
object StoreViews {

  private val layoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private val warnedAbsent =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** True when `dir` holds an ingest store (a `records/` table directory
    * and no testdata `events.parquet`). An EMPTY/ambiguous dir — a store
    * base probed before the daemon's first commit creates `records/`
    * (the startup window can last a full head pause plus the first
    * fetch) — also answers STORE: the store path serves schema-stable
    * `{total:0}` pages from the empty-frame machinery below, where the
    * corpus path would throw on the missing `events.parquet` and turn
    * the whole window into 500s (a corpus dir always carries
    * `events.parquet`, so nothing real routes differently). The verdict
    * is cached only once the directory has RESOLVED to one of the two
    * layouts — a store stays a store and a corpus stays a corpus — so an
    * ambiguous answer is re-checked, never frozen.
    */
  def isStore(spark: SparkSession, dir: String): Boolean = {
    val cached = layoutCache.get(dir)
    if (cached != null) cached.booleanValue
    else {
      val conf = spark.sparkContext.hadoopConfiguration
      val records = new org.apache.hadoop.fs.Path(s"$dir/records")
      val fs = records.getFileSystem(conf)
      val hasRecords = fs.exists(records) && fs.getFileStatus(records).isDirectory
      val isCorpus = fs.exists(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
      // a base dir that does not EXIST at all is a different animal from
      // the genuine startup window (exists, not yet committed): a typo'd
      // serving dir would otherwise serve healthy-looking `{total:0}`
      // 200s forever, and since the ambiguous verdict is never cached the
      // misconfiguration never fails loud anywhere. Still answer store
      // (the daemon may create the dir moments later), but leave one
      // trace per dir for the operator.
      // probe-once ordering: add() short-circuits to true only on the
      // FIRST ambiguous sighting of a dir, so the extra exists() RPC is
      // paid at most once per dir — not on every request hammering a
      // misconfigured (still-ambiguous, hence uncached) serving dir
      if (!hasRecords && !isCorpus && warnedAbsent.add(dir) &&
          !fs.exists(new org.apache.hadoop.fs.Path(dir)))
        System.err.println(s"[serve] base dir does not exist (typo'd " +
          s"SPARK_GRAFT_SF_DIR? serving empty store pages until it appears): $dir")
      // corpus wins when both markers exist (unchanged precedence); an
      // ambiguous dir (neither) answers store, uncached
      val is = !isCorpus
      if (hasRecords || isCorpus) layoutCache.put(dir, is)
      is
    }
  }

  /** Identity bytes → the serving layer's 64-bit key space, nulls kept
    * (an empty reference is P2-normalized to null upstream and must stay
    * an OMITTED field at the JSON edge, not hash to a phantom key).
    */
  private def refKey(c: Column): Column =
    when(c.isNull, lit(null).cast("long")).otherwise(xxhash64(c))

  // Canonical serving schemas, for the EMPTY-TABLE branch below: a brand
  // new store serves `{total:0}` pages from a schema-stable empty frame
  // until the daemon's first commit/flush lands — the records table is
  // written at commit time but the pulses dimension only on the first
  // maintainer flush (up to a pulse period later), and an endpoint must
  // not 500 in that window.
  private val RecordsServingSchema = org.apache.spark.sql.types.StructType(Seq(
    field("reference", "long"), field("type", "string"),
    field("object_reference", "long"), field("prototype_reference", "long"),
    field("prev_record_reference", "long"), field("payload", "binary"),
    field("hash", "binary"), field("jet_id", "string"),
    field("pulse_number", "long"), field("order", "int"), field("ts_sec", "long")))
  private val DropsServingSchema = org.apache.spark.sql.types.StructType(Seq(
    field("pulse_number", "long"), field("jet_id", "string"),
    field("record_amount", "int"), field("timestamp", "long"),
    field("hash", "string"), field("first_prev_hash", "string"),
    field("second_prev_hash", "string")))
  private val PulsesServingSchema = org.apache.spark.sql.types.StructType(Seq(
    field("pulse_number", "long"), field("prev_pulse_number", "long"),
    field("next_pulse_number", "long"), field("is_complete", "boolean"),
    field("is_sequential", "boolean"), field("timestamp", "long"),
    field("jet_drop_amount", "long"), field("record_amount", "long"),
    field("result_amount", "long")))

  private def field(name: String, t: String) =
    org.apache.spark.sql.types.StructField(name,
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseDataType(t))

  /** True when the table directory holds committed data (at least one
    * non-hidden file or partition dir) — a just-created or mid-first-write
    * directory serves as empty instead of failing schema inference.
    */
  private def hasData(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
  }

  private def emptyFrame(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)

  /** The records fact in the endpoints' serving shape. */
  def records(spark: SparkSession, dir: String): DataFrame =
    if (!hasData(spark, s"$dir/records")) emptyFrame(spark, RecordsServingSchema)
    else spark.read.parquet(s"$dir/records").select(
      refKey(col("reference")).as("reference"),
      col("type"),
      refKey(col("object_reference")).as("object_reference"),
      refKey(col("prototype_reference")).as("prototype_reference"),
      refKey(col("prev_record_reference")).as("prev_record_reference"),
      col("payload"),
      col("hash"),
      col("jet_id"),
      col("pulse_number").cast("long").as("pulse_number"),
      col("order"),
      col("timestamp").as("ts_sec"))

  /** The jet_drops dimension with the serving hash convention derived
    * over the pulses chain (broadcast — one row per pulse).
    */
  def jetDrops(spark: SparkSession, dir: String): DataFrame = {
    if (!hasData(spark, s"$dir/jet_drops")) return emptyFrame(spark, DropsServingSchema)
    val drops = spark.read.parquet(s"$dir/jet_drops").select(
      col("pulse_number").cast("long").as("pulse_number"),
      col("jet_id"),
      col("record_amount"),
      col("timestamp"))
    val chain = pulses(spark, dir)
      .select(col("pulse_number").as("pn"), col("prev_pulse_number").as("prev_pn"))
    drops.join(broadcast(chain), col("pulse_number") === col("pn"), "left")
      .withColumn("hash", md5(concat_ws(":", col("jet_id"), col("pulse_number"))))
      .withColumn("first_prev_hash",
        when(col("prev_pn").isNull, lit(null).cast("string"))
          .otherwise(md5(concat_ws(":", col("jet_id"), col("prev_pn")))))
      .withColumn("second_prev_hash", lit(null).cast("string"))
      .drop("pn", "prev_pn")
  }

  /** The daemon-maintained pulses dimension in the serving shape (the
    * bucket partition column is a flush concern, never served; a legacy
    * FLAT layout — no bucket column — serves identically).
    */
  def pulses(spark: SparkSession, dir: String): DataFrame =
    if (!hasData(spark, s"$dir/pulses")) emptyFrame(spark, PulsesServingSchema)
    else {
      val raw = spark.read.parquet(s"$dir/pulses")
      raw.select(
        col("pulse_number").cast("long").as("pulse_number"),
        col("prev_pulse_number"),
        col("next_pulse_number"),
        col("is_complete"),
        col("is_sequential"),
        col("timestamp"),
        col("jet_drop_amount").cast("long").as("jet_drop_amount"),
        col("record_amount"),
        // the per-type counter the gap/status views consume — the corpus
        // spine carries it too, so the SERVED schema is layout-stable.
        // A hand-built legacy dimension without the column serves 0 (the
        // daemon migrates its own legacy stores with a records-table
        // backfill at seed time; a dimension nobody re-seeds has no
        // better source at serve time)
        (if (raw.columns.contains("result_amount")) col("result_amount")
         else lit(0L)).as("result_amount"))
    }
}
