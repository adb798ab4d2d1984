package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("NULL equi-keys and NULL right times match nothing (join semantics)") {
    import spark.implicits._
    // a NULL key matches no right row (equality, not partition grouping),
    // and a NULL right time can never satisfy t_r <= t_l — without the
    // right-side filter the window would sort the NULL-time row first
    // and leak its payload into every earlier left row of its key
    val left = Seq(
      (1L, Option("u1"), 5L), (2L, Option.empty[String], 10L))
      .toDF("id", "user", "t")
    val right = Seq(
      (Option("u1"), Option.empty[Long], 100L), // NULL time: never matches
      (Option.empty[String], Option(1L), 101L), // NULL key: never matches
      (Option("u1"), Option(4L), 102L))
      .toDF("user", "rt", "rid")
    val out = AsOfJoin(left, right, Seq("user"), "t", "rt", Seq("rid"))
      .orderBy("id").collect()
    assert(out(0).getAs[Long]("asof_rid") == 102L,
      "the real (u1, t=4) row matches — not the NULL-time row sorted first")
    assert(out(1).isNullAt(out(1).fieldIndex("asof_rid")),
      "a NULL-key left row matches nothing, even with a NULL-key right row present")
  }

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
