package graft.queries

/**
 * Shared DuckDB-replay SQL fragments for the generated oracles: exact
 * HUGEINT re-implementations of the engine's 64-bit hash arithmetic
 * (StringHash64 = poly-31 over bytes + splitmix64 finalizer, and the
 * signed floorMod bucketing), plus the canonical tokenizer expression.
 * Every fragment is plain modular integer arithmetic — DuckDB replays
 * it bit-exactly, so oracles built on these are hash-compared, never
 * rows-only. Extracted from TextQueries (round 16) so the LM/DSIR
 * oracle generators can share them.
 */
private[queries] object ReplaySql {

  /** `tokens(text)` (TextAnalysis.tokens) in DuckDB list form. */
  val toksSql: String =
    """list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '')"""

  /** 64-bit wraparound multiply in HUGEINT: split the left operand into
    * 32-bit halves so no intermediate exceeds 2^97 (INT128-safe). */
  def mul64(a: String, c: String): String =
    s"((($a) // 4294967296 * $c) % 18446744073709551616 * 4294967296" +
      s" + (($a) % 4294967296) * $c) % 18446744073709551616"

  /** splitmix64 finalizer over a HUGEINT expression in [0, 2^64). */
  def mixSql(h: String): String = {
    val s1 = s"(CAST(($h) AS HUGEINT) + 11400714819323198485) % 18446744073709551616"
    val x1 = s"CAST(xor(CAST(($s1) AS UBIGINT), CAST(($s1) AS UBIGINT) >> 30) AS HUGEINT)"
    val s2 = mul64(x1, "13787848793156543929")
    val x2 = s"CAST(xor(CAST(($s2) AS UBIGINT), CAST(($s2) AS UBIGINT) >> 27) AS HUGEINT)"
    val s3 = mul64(x2, "10723151780598845931")
    s"CAST(xor(CAST(($s3) AS UBIGINT), CAST(($s3) AS UBIGINT) >> 31) AS HUGEINT)"
  }

  /** Signed (Java floorMod) remainder of an unsigned-bits HUGEINT —
    * matches Spark's `pmod(signed long, m)`. */
  def floorModSql(h: String, m: Long): String =
    s"(((CASE WHEN ($h) >= 9223372036854775808 THEN ($h) - 18446744073709551616" +
      s" ELSE ($h) END) % $m + $m) % $m)"

  /** StringHash64(`strVar`, seed): poly-31 over bytes (64-bit wrap; 31
    * is small enough that no operand split is needed), splitmix
    * finalized. `strVar` is a SQL identifier/expression yielding the
    * string to hash (ASCII corpus, so ord(char) == byte). */
  def stringHashSql(strVar: String, seed: Long): String =
    mixSql(
      s"list_reduce(list_prepend(CAST($seed AS HUGEINT), " +
        s"[CAST(ord(c) AS HUGEINT) FOR c IN string_split($strVar, '')]), " +
        "(acc, b) -> (acc * 31 + b) % 18446744073709551616)")
}
