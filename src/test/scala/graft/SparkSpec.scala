package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for operator specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  /** Manifest-aware read of a STORE table (records/jet_drops/pulses).
    * Store writes are manifested commits: a raw `spark.read.parquet`
    * over the directory would also read the superseded generation the
    * manifest keeps as crash/reader grace, double-counting any
    * re-committed pulse — assertions must see what a reader sees.
    */
  def storeTable(base: String, table: String): org.apache.spark.sql.DataFrame =
    graft.ingest.TableManifest.readTable(spark, s"$base/$table").getOrElse(
      throw new IllegalStateException(s"no committed data in $base/$table"))
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = Sessions.withDriftDefaults(SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
