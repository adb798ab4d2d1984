package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("as-of join picks the latest right row at-or-before each left row") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", 5L), (2L, "u1", 10L), (3L, "u1", 20L),
      (4L, "u2", 7L), (5L, "u3", 9L))
      .toDF("id", "user", "t")
    val right = Seq(
      ("u1", 10L, 100L), ("u1", 15L, 101L), // u1: errors at t=10, 15
      ("u2", 3L, 102L))                     // u3: none
      .toDF("user", "rt", "rid")

    val out = AsOfJoin(left, right, Seq("user"), "t", "rt", Seq("rid"))
      .orderBy("id").collect()
    def rid(i: Int): Option[Long] =
      if (out(i).isNullAt(out(i).fieldIndex("asof_rid"))) None
      else Some(out(i).getAs[Long]("asof_rid"))
    assert(rid(0).isEmpty)          // t=5 before any u1 error
    assert(rid(1).contains(100L))   // t=10 ties the error at 10 → included
    assert(rid(2).contains(101L))   // t=20 sees the latest (15)
    assert(rid(3).contains(102L))   // u2 sees its only prior error
    assert(rid(4).isEmpty)          // u3 has no errors at all
    // left columns all preserved
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }
}
