package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share word
  * n-grams with an evaluation/benchmark set, the standard guard against
  * test-set leakage in LLM training pipelines (the reference engine has no
  * analog; this is part of the training-pipeline extension, SURVEY §2.9).
  *
  * Shape for 100 TB: the corpus side streams through the same relational
  * shingle pipeline as the dedup family ([[Dedup.shingleRowsRaw]] — one
  * window over doc-partitioned token rows, all codegen); shingles are
  * hashed to 8-byte keys before any shuffle. The EVAL side is the small
  * side by construction (benchmarks are ~1e3–1e6 items, not corpus-scale)
  * and is broadcast, so the corpus never shuffles at all: scan → shingle
  * window (partitioned by doc) → broadcast hash join → partial aggregate.
  */
object Decontam {

  /** Per-document contamination report: for every corpus document sharing
    * at least one n-gram with the eval set, the number of distinct
    * overlapping n-grams and of distinct eval documents hit.
    *
    * Counts over 64-bit shingle hashes equal counts over the strings
    * absent an xxhash64 collision among distinct shingles (same argument
    * as dd_ngram_jaccard; the DuckDB oracle keeps strings, so the
    * correctness gate would surface one).
    */
  def overlapReport(
      corpus: DataFrame,
      evalSet: DataFrame,
      n: Int = 4,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val ev = Dedup.shingleHashRows(evalSet, idCol, textCol, n)
      .select(col("id").as("eval_id"), col("h").as("sh"))
      .distinct()
    // The corpus side stays RAW occurrences: countDistinct absorbs
    // multiplicity, so the only shuffle in the whole query is the final
    // per-document aggregate (the broadcast join runs inside the scan
    // stage).
    val cs = Dedup.shingleHashRows(corpus, idCol, textCol, n)
      .select(col("id"), col("h").as("sh"))
    cs.join(broadcast(ev), Seq("sh"))
      .groupBy(col("id"))
      .agg(
        countDistinct(col("sh")).as("n_hit_ngrams"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
      .select(col("id").as(idCol), col("n_hit_ngrams"), col("n_eval_docs"))
  }
}
