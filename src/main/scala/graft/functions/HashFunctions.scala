package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.graft.Md5Long63
import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic 63-bit hashing used across the engine (MinHash, SimHash,
  * LSH banding, fingerprints).
  *
  * Definition: `md5_63(s)` = little-endian unsigned integer of bytes 8..15
  * of `MD5(utf8(s))`, masked to 63 bits (`& Long.MaxValue`) so the value is
  * non-negative. This is exactly DuckDB's `md5_number_lower(s) &
  * 9223372036854775807`, which makes every hash-derived operator
  * oracle-checkable in ANSI-ish SQL. MD5 was chosen over xxhash64 purely
  * for that cross-engine parity; at 100 TB scale swap in
  * [[org.apache.spark.sql.functions.xxhash64]] (identical plumbing, no
  * oracle).
  */
object HashUtil {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def md5Lower63(bytes: Array[Byte]): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(bytes)
    var v = 0L
    var i = 15
    while (i >= 8) { v = (v << 8) | (d(i) & 0xffL); i -= 1 }
    v & Long.MaxValue
  }

  /** md5Lower63 of `prefix ++ bytes` without concatenating (two digest
    * updates) — the per-(perm, shingle) hot call of
    * [[org.apache.spark.sql.graft.MinHashSig]]. */
  def md5Lower63(prefix: Array[Byte], bytes: Array[Byte]): Long = {
    val digest = md.get()
    digest.reset()
    digest.update(prefix)
    val d = digest.digest(bytes)
    var v = 0L
    var i = 15
    while (i >= 8) { v = (v << 8) | (d(i) & 0xffL); i -= 1 }
    v & Long.MaxValue
  }

  def md5Lower63(s: UTF8String): Long = md5Lower63(s.getBytes)

  def md5Lower63(s: String): Long = md5Lower63(s.getBytes("UTF-8"))
}

object GraftFunctions {
  /** 63-bit MD5-derived hash of a string column (see [[HashUtil]]), as a
    * whole-stage-codegen'd native Catalyst expression — not a Scala UDF.
    * DuckDB oracle equivalent:
    * `(md5_number_lower(s) & 9223372036854775807)::BIGINT`. */
  def md5_63(c: Column): Column = GraftShim.column(Md5Long63(GraftShim.expression(c)))

  /** Intersection cardinality of two ascending-sorted array columns with
    * int, long, or string elements (codegen'd merge-walk; see
    * [[org.apache.spark.sql.graft.SortedIntersectCount]]). */
  def sorted_intersect_count(a: Column, b: Column): Column =
    GraftShim.column(org.apache.spark.sql.graft.SortedIntersectCount(
      GraftShim.expression(a), GraftShim.expression(b)))

  /** Jaro–Winkler similarity of two string columns (codegen'd native
    * expression, DuckDB-`jaro_winkler_similarity`-pinned semantics; see
    * [[graft.functions.StringSim]] / [[org.apache.spark.sql.graft.JaroWinkler]]). */
  def jaro_winkler(a: Column, b: Column): Column =
    GraftShim.column(org.apache.spark.sql.graft.JaroWinkler(
      GraftShim.expression(a), GraftShim.expression(b)))

  /** Per-group top-k aggregate: the k SMALLEST values of `c` under
    * Spark's natural ordering, as a sorted array — the map-side-combined
    * replacement for the row_number-window top-k (see
    * [[org.apache.spark.sql.graft.TopKAgg]]; encode composite/descending
    * ranks as struct fields, negating numerics for descending). */
  def topk_agg(c: Column, k: Int): Column =
    GraftShim.column(org.apache.spark.sql.graft.TopKAgg(
      GraftShim.expression(c), k).toAggregateExpression())

  /** KMV cardinality-sketch aggregate: the k smallest DISTINCT 63-bit
    * hash values per group as a sorted array — set semantics, so raw
    * (duplicated) key streams need no distinct pre-shuffle; 8k-byte
    * mergeable state (see [[org.apache.spark.sql.graft.KmvAgg]]). */
  def kmv_agg(hash: Column, k: Int): Column =
    GraftShim.column(org.apache.spark.sql.graft.KmvAgg(
      GraftShim.expression(hash), k).toAggregateExpression())

  /** HyperLogLog register aggregate (p = 8): full 256-entry register
    * array per group from a 63-bit hash column — 256 bytes of
    * order-free mergeable state; estimate derived relationally with
    * the q234 formulas (see [[org.apache.spark.sql.graft.HllAgg]]). */
  def hll_agg(hash: Column): Column =
    GraftShim.column(org.apache.spark.sql.graft.HllAgg(
      GraftShim.expression(hash)).toAggregateExpression())

  /** One-pass MinHash signature aggregate → array<long> of numPerm mins
    * per group (custom TypedImperativeAggregate; see
    * [[org.apache.spark.sql.graft.MinHashAgg]] — the fast/scale variant
    * of [[graft.text.TextAnalysis.minhashSignatures]]). */
  def minhash_agg(token: Column, numPerm: Int): Column =
    GraftShim.column(org.apache.spark.sql.graft.MinHashAgg(
      GraftShim.expression(token), numPerm).toAggregateExpression())

  /** Whole per-row MinHash signature (array<string> shingles →
    * array<long> of numPerm mins) as one codegen'd expression — the
    * zero-shuffle/streaming signature path (see
    * [[org.apache.spark.sql.graft.MinHashSig]]). Values are identical to
    * the exploded `min md5_63(p:shingle)` family (q25's — DedupSpec pins
    * the paths equal), NOT to [[minhash_agg]]'s affine family. */
  def minhash_sig(shingles: Column, numPerm: Int): Column =
    GraftShim.column(org.apache.spark.sql.graft.MinHashSig(
      GraftShim.expression(shingles), numPerm))

  // ---------------------------------------------------------------------
  // Rounding-mode-INVARIANT quantization (determinism rule,
  // ARCHITECTURE.md): `round(double, n)` and a raw double→DECIMAL CAST
  // resolve half-boundaries by an engine- and version-dependent rounding
  // mode (Spark: BigDecimal HALF_UP on the exact binary value; DuckDB:
  // changed across releases), so a hashed output surface built from them
  // is a per-release lottery at the oracle gate. These helpers quantize
  // with pure IEEE binary64 arithmetic — multiply, add, floor, divide —
  // which every engine computes bit-identically, so engine and oracle
  // agree BY CONSTRUCTION whenever their inputs agree.
  // ---------------------------------------------------------------------

  /** The platform's canonical 50/50 A/B assignment: variant =
    * pmod(md5_63("ab:" ‖ user), 2) → "A"/"B". q308 certifies this
    * split's sample ratio and q131/q304 read metrics on it — every
    * consumer goes through THIS helper so the certified split and the
    * tested split are structurally one expression (a salt edit in a
    * copy would silently decouple them). Oracle twin: the
    * `md5_number_lower('ab:' ‖ user) & 2⁶³−1 % 2` CASE. */
  def abVariant(user: Column): Column = {
    import org.apache.spark.sql.functions.{concat, lit, pmod, when}
    when(pmod(md5_63(concat(lit("ab:"), user)), lit(2)) === 0, "A")
      .otherwise("B")
  }

  /** Sample-ratio-mismatch statistic for a 50/50 design: the 1-dof
    * chi-square (n_a−n_b)²/(n_a+n_b) and its α=0.05 flag (3.841 bar) —
    * shared by the batch certification (q308) and its streaming twin
    * (q315), which are oracle-gated to the SAME SQL; one expression
    * here means an edit to the bar or the form cannot decouple them.
    * Returns (chi2 quantized to 6dp, flag as 0/1 long). */
  def srmColumns(nA: Column, nB: Column): (Column, Column) = {
    import org.apache.spark.sql.functions.when
    val chi = (nA - nB).cast("double") * (nA - nB) / (nA + nB)
    (qround(chi, 6), when(chi > 3.841, 1L).otherwise(0L))
  }

  /** Half-up quantization of a double to `s` decimal places, emitted as
    * DOUBLE: `floor(x·10^s + 0.5) / 10^s`. Oracle twin: [[qroundSql]].
    * (Negative half-boundaries round toward +∞, unlike HALF_UP's
    * away-from-zero — irrelevant to the gate, which only needs the two
    * engines to agree with EACH OTHER.)
    *
    * NULL/NaN/±Inf pass through untouched: Spark's `floor(double)`
    * returns LONG (NaN→0, +Inf→Long.Max) where SQL engines keep the
    * special double — the guard restores `round()`'s NaN-preserving
    * behavior, which the plain oracle formula already has. */
  def qround(c: Column, s: Int): Column = {
    import org.apache.spark.sql.functions.{floor, isnan, lit, when}
    val f = lit(math.pow(10, s))
    when(c.isNull || isnan(c) ||
      c === lit(Double.PositiveInfinity) ||
      c === lit(Double.NegativeInfinity), c)
      .otherwise(floor(c * f + lit(0.5)) / f)
  }

  /** [[qround]] pinned to an exact DECIMAL(p,s): after quantization the
    * value is within 1 ulp of an exact scale-`s` decimal — far from every
    * cast half-boundary — so the final decimal CAST is unambiguous under
    * any rounding mode. Oracle twin: [[qdecSql]]. */
  def qdec(c: Column, p: Int, s: Int): Column =
    qround(c, s).cast(s"decimal($p,$s)")

  /** Oracle-SQL twin of [[qround]] — textually the same IEEE formula. */
  def qroundSql(x: String, s: Int): String = {
    val f = "1" + ("0" * s) + ".0"
    s"floor(($x) * $f + 0.5) / $f"
  }

  /** Oracle-SQL twin of [[qdec]]. */
  def qdecSql(x: String, p: Int, s: Int): String =
    s"CAST(${qroundSql(x, s)} AS DECIMAL($p,$s))"

  /** Saturation-free [[qround]] for NON-NEGATIVE magnitudes of any size
    * (VERDICT r11 #3): [[qround]]'s `floor(x·10^s + 0.5)` runs through
    * Spark's `floor(double) → LONG`, which silently saturates at
    * Long.Max (x·10^s ≳ 9.2×10¹⁸) while DuckDB's floor stays double — a
    * cross-engine divergence ceiling that q336/q338's group terms would
    * reach around sf100. This variant floors WITHOUT leaving double
    * space via the IEEE-exact identity `floor(y) = y − fmod(y, 1)` for
    * y ≥ 0 (fmod is exact by IEEE-754, and Java's `%` on doubles IS
    * fmod, as is DuckDB's) — so both engines compute bit-identical
    * results at every magnitude: below 2⁵³ it equals [[qround]]
    * exactly; above 2⁵³ the double carries no fractional bits, fmod
    * yields 0, and quantization is the identity on an already-exact
    * value in BOTH engines. No long intermediate, no ceiling.
    * Input contract: c ≥ 0 (squares / variances) — callers quantizing
    * possibly-negative values keep [[qround]]. Oracle twin:
    * [[qroundWideSql]].
    *
    * NULL/NaN/±Inf pass through untouched, like [[qround]]: without the
    * guard, ±Inf % 1.0 = NaN would turn an infinity into NaN, and the
    * downstream decimal cast of a special value is NULL in Spark but a
    * conversion ERROR in DuckDB — an engine-row-vs-oracle-error gate
    * red. The SQL twin carries the same guard for the same reason. */
  def qroundWide(c: Column, s: Int): Column = {
    import org.apache.spark.sql.functions.{isnan, lit, when}
    val f = lit(math.pow(10, s))
    val y = c * f + lit(0.5)
    when(c.isNull || isnan(c) ||
      c === lit(Double.PositiveInfinity) ||
      c === lit(Double.NegativeInfinity), c)
      .otherwise((y - (y % lit(1.0))) / f)
  }

  /** [[qroundWide]] pinned to an exact DECIMAL(p,s). Below 2⁵³ the
    * quantized double is within 1 ulp of an exact scale-`s` decimal (the
    * [[qdec]] argument); above 2⁵³ every double IS an exact integer, so
    * the decimal cast is rounding-mode-independent at every magnitude.
    * Like [[qdec]], the DECIMAL variant requires FINITE inputs: a
    * NaN/Inf passed through the guard still reaches the decimal cast,
    * where Spark yields NULL but DuckDB errors — only [[qroundWide]]'s
    * DOUBLE surface carries special values safely across engines.
    * Oracle twin: [[qdecWideSql]]. */
  def qdecWide(c: Column, p: Int, s: Int): Column =
    qroundWide(c, s).cast(s"decimal($p,$s)")

  /** Oracle-SQL twin of [[qroundWide]] — the same IEEE ops (DuckDB's
    * fmod(double) is the same exact IEEE remainder) behind the same
    * special-value guard. */
  def qroundWideSql(x: String, s: Int): String = {
    val f = "1" + ("0" * s) + ".0"
    s"CASE WHEN ($x) IS NULL OR isnan($x) OR isinf($x) THEN ($x) ELSE " +
      s"((($x) * $f + 0.5) - fmod(($x) * $f + 0.5, 1.0)) / $f END"
  }

  /** Oracle-SQL twin of [[qdecWide]]. */
  def qdecWideSql(x: String, p: Int, s: Int): String =
    s"CAST(${qroundWideSql(x, s)} AS DECIMAL($p,$s))"

  // ---------------------------------------------------------------------
  // Hash-safe OUTPUT projection (determinism rule, r9): the driver's
  // hasher canonicalizes DECIMAL through a float64 round-trip on one side
  // and a fixed-scale decimal string on the other, so ANY DecimalType on
  // a gated output surface is a representation lottery (r8 verdict: all
  // 25 hash-reds had a decimal column; zero DOUBLE/BIGINT surfaces have
  // ever gone red in 8 rounds). Decimal/integer arithmetic stays the
  // right tool INTERNALLY (order-free exact sums); these helpers are the
  // only sanctioned way to put such a value on a gated output:
  // fractional → DOUBLE via [[decOut]], exact integers → BIGINT via a
  // plain long cast, >63-bit fingerprints → BIGINT via [[decFold]].
  // RoundingAuditSpec fails the build on any DecimalType output column.
  // ---------------------------------------------------------------------

  /** Project an exact DECIMAL(p,s) value onto the output surface as
    * DOUBLE. The decimal→double casts of two engines may differ by an
    * ulp (DuckDB scales int128, Spark rounds BigDecimal), so the cast is
    * re-quantized through [[qround]]: x·10^s lands within a few ulp of
    * the integer n = value·10^s, far from `floor`'s boundary at n+0.5,
    * so both engines recover the identical double n/10^s. Requires
    * |value·10^s| ≲ 2^52. Oracle twin: [[decOutSql]]. */
  def decOut(c: Column, s: Int): Column = qround(c.cast("double"), s)

  /** Oracle-SQL twin of [[decOut]]. */
  def decOutSql(x: String, s: Int): String =
    qroundSql(s"CAST(($x) AS DOUBLE)", s)

  /** Project a DECIMAL(38,0) fingerprint/checksum wider than 63 bits onto
    * the output surface as BIGINT: value mod 2^63. Equally
    * collision-safe for a change detector and exactly representable in
    * every engine. Both engines' `%` follows the dividend sign; callers
    * feed non-negative sums. Oracle twin: [[decFoldSql]]. */
  def decFold(c: Column): Column = {
    import org.apache.spark.sql.functions.lit
    (c % lit(new java.math.BigDecimal("9223372036854775808"))).cast("long")
  }

  /** Oracle-SQL twin of [[decFold]] (the literal parses as HUGEINT). */
  def decFoldSql(x: String): String =
    s"CAST(($x) % 9223372036854775808 AS BIGINT)"
}
