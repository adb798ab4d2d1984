package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share word
  * n-grams with an evaluation/benchmark set, the standard guard against
  * test-set leakage in LLM training pipelines (the reference engine has no
  * analog; this is part of the training-pipeline extension, SURVEY §2.9).
  *
  * Shape for 100 TB: both sides use the native one-pass shingle kernel
  * ([[Dedup.shingleHashRows]] — no token rows, no window sort; 8-byte
  * keys from the scan onward). The EVAL side is the small side by
  * construction (benchmarks are ~1e3–1e6 items, not corpus-scale) and is
  * broadcast, so the corpus's only shuffle is the final per-document
  * aggregate: scan → codegen shingle explode → broadcast hash join →
  * map-side-combined aggregate.
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
