package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JetFunctionsSpec extends SparkSpec {

  // Brute-force cover oracle: the set covers the tree iff recursing from
  // the root, every path hits a present jet at or above maxDepth.
  private def bruteCover(jets: Set[String]): Boolean = {
    if (jets.isEmpty) return false
    val maxDepth = jets.map(_.length).max
    def ok(j: String): Boolean =
      if ((0 to j.length).exists(i => jets.contains(j.substring(0, i)))) true
      else if (j.length >= maxDepth) false
      else ok(j + "0") && ok(j + "1")
    ok("")
  }

  test("tree cover: root alone covers") {
    assert(JetFunctions.jetTreeCover(Set("")))
  }

  test("tree cover: full depth-2 leaf set covers") {
    assert(JetFunctions.jetTreeCover(Set("00", "01", "10", "11")))
  }

  test("tree cover: missing sibling subtree fails") {
    assert(!JetFunctions.jetTreeCover(Set("00", "01", "10")))
  }

  test("tree cover: mixed depths cover (one side split deeper)") {
    assert(JetFunctions.jetTreeCover(Set("0", "10", "11")))
    assert(JetFunctions.jetTreeCover(Set("0", "10", "110", "111")))
    assert(!JetFunctions.jetTreeCover(Set("0", "10", "110")))
  }

  test("tree cover: one deep jet id answers in linear time (prefix prune), " +
      "and null jet ids are ignored, not NPE") {
    // pre-prune, one 40-bit id explored ~2^39 nodes before returning
    // false — effectively a hang; with the prune this is microseconds
    val deep = Set("1" * 40)
    val t0 = System.nanoTime()
    assert(!JetFunctions.jetTreeCover(deep))
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "deep-jet check must be pruned")
    assert(JetFunctions.jetTreeCover(Set("0", "1", null)))
    assert(!JetFunctions.jetTreeCover(Set(null)))
  }

  test("property: tree cover equals brute-force oracle on random sets") {
    for (seed <- 0 until 300) {
      val rnd = new scala.util.Random(seed)
      val all = (for (d <- 1 to 3; i <- 0 until (1 << d))
        yield String.format("%" + d + "s", Integer.toBinaryString(i)).replace(' ', '0')).toVector
      val jets = all.filter(_ => rnd.nextDouble() < 0.45).toSet
      assert(JetFunctions.jetTreeCover(jets) == bruteCover(jets), s"seed=$seed jets=$jets")
    }
  }

  test("parent / sibling / ancestors column functions") {
    import spark.implicits._
    val df = Seq("101", "1", "").toDF("jet")
    val out = df.select(
      JetFunctions.jetParent(col("jet")).as("parent"),
      JetFunctions.jetSibling(col("jet")).as("sibling"),
      JetFunctions.jetAncestors(col("jet")).as("anc")).collect()
    assert(out(0).getString(0) == "10" && out(0).getString(1) == "100")
    assert(out(0).getSeq[String](2) == Seq("1", "10"))
    assert(out(1).getString(0) == "" && out(1).getString(1) == "0")
    assert(out(2).isNullAt(1)) // root has no sibling
  }

  test("jet tree predicate selects subtree plus ancestors") {
    import spark.implicits._
    val df = Seq("1", "10", "100", "101", "11", "0").toDF("jet")
    val got = df.filter(JetFunctions.jetTreePredicate(col("jet"), "10"))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("1", "10", "100", "101"))
  }

  test("jetIdBits unpacks depth-prefixed bytes") {
    assert(JetFunctions.jetIdBits(0, Array[Byte](-1)) == "")
    assert(JetFunctions.jetIdBits(3, Array[Byte](-96)) == "101") // 0xA0 = 1010_0000
    assert(JetFunctions.jetIdBits(8, Array[Byte](0x0f)) == "00001111")
  }
}
