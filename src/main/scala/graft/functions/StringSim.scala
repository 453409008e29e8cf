package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Jaro / Jaro–Winkler string similarity — the scoring half of fuzzy
  * entity resolution (the candidate-generation half is blocking:
  * [[graft.text.Fuzzy.nearNamePairs]] / sortedNeighborhoodPairs).
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` so every use
  * is oracle-checkable cross-engine (probed empirically, 2026-08):
  *  - match window = max(|s|,|t|)/2 − 1 (floor, can be 0);
  *  - transpositions = ⌊mismatched-match-positions / 2⌋ (INTEGER floor —
  *    'abcdef'/'bcadef' has 3 mismatches and scores 17/18, not 35/36);
  *  - either side empty ⇒ 0.0 (including both empty);
  *  - Winkler prefix boost `j + 0.1·l·(1−j)`, l = common prefix ≤ 4,
  *    applied only when jaro > 0.7 (the textbook boost threshold);
  *  - case-sensitive, compared on UTF-16 code units.
  */
object StringSim {

  def jaro(s: String, t: String): Double = {
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val hi = math.min(m - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var mismatches = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val t2 = (mismatches / 2).toDouble
    (mm / n + mm / m + (mm - t2) / mm) / 3.0
  }

  def jaroWinkler(s: String, t: String): Double = {
    val j = jaro(s, t)
    if (j <= 0.7) return j
    var l = 0
    val max = math.min(4, math.min(s.length, t.length))
    while (l < max && s.charAt(l) == t.charAt(l)) l += 1
    j + 0.1 * l * (1.0 - j)
  }

  /** UTF8String entry point for the codegen'd Catalyst expression. */
  def jaroWinkler(s: UTF8String, t: UTF8String): Double =
    jaroWinkler(s.toString, t.toString)
}
