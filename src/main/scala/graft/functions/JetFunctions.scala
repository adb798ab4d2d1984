package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Jet-tree column functions.
  *
  * A jet id is a bit-prefix string over {0,1} (root = "", rendered "*" at the
  * API edge). The jet tree is a binary tree where jet J splits into J+"0" and
  * J+"1" each pulse. reference semantics: `etl/models/models.go:57-64`,
  * `etl/storage/helper.go:5-14`, `instrumentation/converter/platform.go:15-30`.
  *
  * All functions are pure Catalyst column expressions (codegen-friendly, no
  * UDFs) so they stay inside whole-stage codegen and push down where possible.
  */
object JetFunctions {

  /** Parent prefix of a jet id ("" for root). */
  def jetParent(jetId: Column): Column =
    when(length(jetId) <= 1, lit(""))
      .otherwise(jetId.substr(lit(1), length(jetId) - 1))

  /** Children of a jet id: [id+"0", id+"1"]. models.go:57-64. */
  def jetChildren(jetId: Column): Column =
    array(concat(jetId, lit("0")), concat(jetId, lit("1")))

  /** Sibling of a jet id (flip last bit); root has no sibling → null. */
  def jetSibling(jetId: Column): Column =
    when(length(jetId) === 0, lit(null).cast("string"))
      .otherwise(concat(
        jetId.substr(lit(1), length(jetId) - 1),
        when(jetId.substr(length(jetId), lit(1)) === "0", lit("1")).otherwise(lit("0"))))

  /** All strict ancestors of a jet id, shortest first (root "" excluded to
    * mirror `GetJetIDParents` which enumerates non-empty prefixes).
    * Implemented with `sequence`+`transform` — stays in codegen.
    */
  def jetAncestors(jetId: Column): Column =
    when(length(jetId) <= 1, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), length(jetId) - 1),
        n => jetId.substr(lit(1), n)))

  /** P6 — jet subtree + ancestors predicate:
    * `jet_id` is an ancestor of `prefix` OR starts with `prefix`.
    * reference: `etl/storage/storage.go:540` + `helper.go:5-14`.
    * Scala-side ancestor list → an IN-list Catalyst can evaluate cheaply;
    * `startsWith` compiles to `StartsWith` which parquet can't push but
    * dictionary filters handle well.
    */
  def jetTreePredicate(jetId: Column, prefix: String): Column = {
    val ancestors = (1 until prefix.length).map(prefix.substring(0, _))
    val self = jetId.startsWith(prefix)
    if (ancestors.isEmpty) self else self || jetId.isin(ancestors: _*)
  }

  /** Sibling set used for prev/next jet-drop lookup (J4): the jet itself,
    * its two children, and its parent. reference: `etl/storage/storage.go:496-531`.
    */
  def jetLinkCandidates(jetId: String): Seq[String] = {
    val parent = if (jetId.isEmpty) Seq.empty else Seq(jetId.substring(0, jetId.length - 1))
    Seq(jetId, jetId + "0", jetId + "1") ++ parent
  }

  /** F1 — render a (depth, 8-byte big-endian prefix) jet id as a bit string.
    * reference: `instrumentation/converter/platform.go:15-30`.
    */
  def jetIdBits(depth: Int, prefix: Array[Byte]): String = {
    val sb = new StringBuilder(depth)
    var i = 0
    while (i < depth && (i / 8) < prefix.length) {
      val bit = (prefix(i / 8) >> (7 - (i % 8))) & 1
      sb.append(if (bit == 1) '1' else '0')
      i += 1
    }
    sb.toString
  }

  /** Scala-side full-binary-tree cover check (ST2): does `jets` form a
    * complete cover of the jet tree — i.e. walking every leaf-to-root path,
    * each jet present has all of the tree "filled"? Mirrors
    * `etl/controller/pulsemaintainer.go:145-212`: a pulse is complete when
    * for every jet id in the set, every prefix-sibling along its path is
    * itself covered (present, or an ancestor present, or its full subtree
    * present at deeper ids).
    */
  def jetTreeCover(jets0: Set[String]): Boolean = {
    val jets = jets0.filter(_ != null) // a NULL jet_id row must not NPE the job
    if (jets.isEmpty) return false
    // covered(j): j or an ancestor of j is present, or both children subtrees
    // of j are (recursively) covered by deeper ids. The descent PRUNES on
    // "no jet extends this prefix": without it the walk explores the full
    // binary tree to maxDepth and one deep jet id (a 40-bit id is legal,
    // parseJetDropId accepts 216) makes the check exponential — ~2^39
    // nodes before returning false. With the prune, work is bounded by
    // the nodes lying on actual jet paths: O(Σ|jet| × set lookup).
    val maxDepth = jets.map(_.length).max
    def covered(j: String): Boolean = {
      if (jets.contains(j)) true
      else if ((1 to j.length).exists(i => jets.contains(j.substring(0, i)))) true
      else if (j.length >= maxDepth) false
      else if (!jets.exists(_.startsWith(j))) false
      else covered(j + "0") && covered(j + "1")
    }
    covered("")
  }
}
