package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Suffix-array-based exact-substring verification pass (north-star
  * component). Catches containment duplicates that set-based Jaccard
  * under-scores (truncation/boilerplate-wrap mutations — the reference's
  * crop/offset augmentations, `benchmarks/augmented_dataset/labels.csv`).
  *
  * Runs AFTER candidate generation, so each task sees a bounded pair
  * group (reference analog: template matching runs per-file against a
  * small template set, `winnow/search_engine/template_matching.py:122-166`).
  * Pure Scala per-pair kernel inside one `mapPartitions`-equivalent typed
  * map — no shuffle beyond the candidate join itself.
  */
object ExactSubstring {

  /** Suffix array of `s` (indices of sorted suffixes). O(n log^2 n)
    * prefix-doubling; n here is a single document (~KBs), built
    * per-pair inside a task.
    */
  def suffixArray(s: String): Array[Int] = {
    val n = s.length
    val sa = Array.tabulate(n)(identity)
    var rank = Array.tabulate(n)(i => s.charAt(i).toInt)
    var tmp = new Array[Int](n)
    var k = 1
    val ord = new Ordering[Int] {
      var kk = 1
      def compare(a: Int, b: Int): Int = {
        if (rank(a) != rank(b)) return rank(a) - rank(b)
        val ra = if (a + kk < n) rank(a + kk) else -1
        val rb = if (b + kk < n) rank(b + kk) else -1
        ra - rb
      }
    }
    while (k < n) {
      ord.kk = k
      scala.util.Sorting.stableSort(sa)(ord)
      tmp(sa(0)) = 0
      var i = 1
      while (i < n) {
        tmp(sa(i)) = tmp(sa(i - 1)) + (if (ord.compare(sa(i - 1), sa(i)) < 0) 1 else 0)
        i += 1
      }
      val t = rank; rank = tmp; tmp = t
      if (rank(sa(n - 1)) == n - 1) k = n // all distinct: done
      else k <<= 1
    }
    sa
  }

  /** Binary search: does `needle` occur in `hay` (whose suffix array is
    * `sa`)? Standard lower-bound over suffixes.
    */
  def containsVia(hay: String, sa: Array[Int], needle: String): Boolean = {
    var lo = 0
    var hi = sa.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val suf = sa(mid)
      val cmp = compareSuffix(hay, suf, needle)
      if (cmp == 0) return true
      else if (cmp < 0) lo = mid + 1
      else hi = mid - 1
    }
    false
  }

  /** Compare hay[suf..] against needle, prefix-wise: 0 if needle is a
    * prefix of the suffix.
    */
  private def compareSuffix(hay: String, suf: Int, needle: String): Int = {
    var i = 0
    val nH = hay.length
    val nN = needle.length
    while (i < nN) {
      if (suf + i >= nH) return -1 // suffix shorter: suffix < needle
      val c = hay.charAt(suf + i) - needle.charAt(i)
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** For candidate pairs(id_a, id_b) over docs(id, text): emit pairs
    * where the shorter text occurs verbatim inside the longer
    * (contained = true/false). Deterministic; text is compared as-is —
    * normalize upstream if desired.
    *
    * Pairs are grouped by their HAY document (the longer side) so the
    * O(n log^2 n) suffix array is built ONCE per hay doc per batch, then
    * each needle is an O(m log n) binary search — a hay appearing in k
    * candidate pairs no longer pays k constructions.
    */
  def containmentPairs(candidates: DataFrame, docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val a = docs.select(col("id").as("id_a"), col("text").as("text_a"))
    val b = docs.select(col("id").as("id_b"), col("text").as("text_b"))
    val oriented = candidates.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
      .select(col("id_a").cast("string"), col("id_b").cast("string"),
        col("text_a"), col("text_b"))
      .as[(String, String, String, String)]
      .map { case (ia, ib, ta, tb) =>
        // (hayId, idA, idB, hayText, needleText); hay = longer side
        if (ta.length >= tb.length) (ia, ia, ib, ta, tb)
        else (ib, ia, ib, tb, ta)
      }
    oriented.groupByKey(_._1).flatMapGroups { (_, rows) =>
      var hay: String = null
      var sa: Array[Int] = null
      rows.map { case (_, ia, ib, hayText, needle) =>
        if (hay == null) {
          hay = hayText
          if (hay.nonEmpty) sa = suffixArray(hay)
        }
        val contained =
          if (needle.isEmpty) true
          else if (hay.isEmpty) false
          else containsVia(hay, sa, needle)
        (ia, ib, contained)
      }
    }.toDF("id_a", "id_b", "contained")
  }
}
