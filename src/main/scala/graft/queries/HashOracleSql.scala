package graft.queries

/** Shared DuckDB-SQL fragments that recompute the engine's text-hash
  * kernels bit-exactly (`functions/expr/HashExpressions.scala`). The
  * kernels are deliberately arithmetic-only public constructions
  * (FNV-1a 64 over UTF-8 bytes + murmur fmix64), so an oracle can
  * re-derive the 64-bit values rather than settling for rows-only
  * checks: unsigned-64 state rides as HUGEINT in [0, 2^64), products
  * split at 2^32 so nothing overflows 128 bits, bytes come from
  * HEX(ENCODE(token)) (UTF-8 bytes, not code points), and the per-byte
  * loop is a recursive CTE bounded by the longest token. Used by the
  * q22 SimHash and q32 rolling-fingerprint oracles.
  */
private[queries] object HashOracleSql {

  val M64 = "18446744073709551616" // 2^64
  val SIGN = "9223372036854775808" // 2^63

  /** A double as a DuckDB literal that parses back bit-identical:
    * `Double.toString` is the shortest round-trip representation, and an
    * exponent suffix (`0.5E0`) makes DuckDB type it DOUBLE directly.
    * The float→double path of every engine kernel makes captured FLOAT
    * state (centroids, codebooks) exactly representable this way — the
    * foundation of the GENERATED oracles (q96 and the ANN family).
    */
  def dlit(x: Double): String = {
    val s = x.toString
    if (s.contains('E') || s.contains('e')) s else s + "E0"
  }

  /** `[..] AS DOUBLE[]` literal for a float vector (see [[dlit]]). */
  def vlit(v: Array[Float]): String =
    s"CAST([${v.map(x => dlit(x.toDouble)).mkString(", ")}] AS DOUBLE[])"

  /** `(expr) mod 2^64` reinterpreted as a signed BIGINT (two's
    * complement wrap) — how the engine's Long-typed results compare.
    */
  def wrapSigned(expr: String): String =
    s"CAST(CASE WHEN $expr >= $SIGN::HUGEINT THEN $expr - $M64::HUGEINT ELSE $expr END AS BIGINT)"

  /** `(h * c) mod 2^64` for h and c both [0,2^64) HUGEINT expressions:
    * split h at 2^32 so both partial products fit HUGEINT
    * ((h>>32)·c ≤ 2^96).
    */
  def mulMod64(h: String, c: String): String =
    s"""((($h // 4294967296) * ($c) % 4294967296) * 4294967296
         + ($h % 4294967296) * ($c)) % $M64::HUGEINT"""

  def mulMod64(h: String, c: BigInt): String = mulMod64(h, s"$c::HUGEINT")

  /** CTE chain computing x = fmix64(fnv1a_64(token)) for every row of a
    * `tokh(tid, hx, ...)` relation (hx = HEX(ENCODE(token)); tid any
    * unique row id); yields `sig(tid, x)` with x HUGEINT in [0, 2^64).
    * Must be spliced into a WITH RECURSIVE. The byte step is
    * h' = ((h XOR byte) * FNV_PRIME) mod 2^64 — the XOR touches only the
    * low byte, so it runs in BIGINT on (h mod 256); fmix64's
    * xor-shift-multiply runs on whole HUGEINTs (DuckDB xor supports
    * HUGEINT; `// 2^33` is the logical right shift).
    */
  val fnvFmixCtes: String =
    s"""fnv(tid, i, nb, h) AS (
          SELECT tid, 0, LEN(hx)//2, 14695981039346656037::HUGEINT FROM tokh
          UNION ALL
          SELECT f.tid, f.i + 1, f.nb,
            ((f.h - (f.h % 256) + xor((f.h % 256)::BIGINT,
                (16 * (STRPOS('0123456789ABCDEF', SUBSTR(t.hx, 2*f.i+1, 1)) - 1)
                  + (STRPOS('0123456789ABCDEF', SUBSTR(t.hx, 2*f.i+2, 1)) - 1))::BIGINT)::HUGEINT)
              * 1099511628211::HUGEINT) % $M64::HUGEINT
          FROM fnv f JOIN tokh t USING (tid) WHERE f.i < f.nb),
        fm1 AS (SELECT tid, xor(h, h // 8589934592::HUGEINT) AS x FROM fnv WHERE i = nb),
        fm2 AS (SELECT tid, ${mulMod64("x", BigInt("ff51afd7ed558ccd", 16))} AS x FROM fm1),
        fm3 AS (SELECT tid, xor(x, x // 8589934592::HUGEINT) AS x FROM fm2),
        fm4 AS (SELECT tid, ${mulMod64("x", BigInt("c4ceb9fe1a85ec53", 16))} AS x FROM fm3),
        sig AS (SELECT tid, xor(x, x // 8589934592::HUGEINT) AS x FROM fm4)"""
}
