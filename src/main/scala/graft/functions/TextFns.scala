package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic text/hash column builders.
  *
  * Every helper here has an exact DuckDB-SQL equivalent (documented per
  * function) so queries built on them are oracle-checkable. All hashing
  * goes through md5 → first 8 hex chars → unsigned 32-bit value in a
  * BIGINT ("h32"): md5 is bit-identical everywhere, and 32-bit values keep
  * all downstream modular arithmetic inside the non-overflowing BIGINT
  * range (DuckDB raises on 64-bit overflow; Spark wraps — we avoid the
  * divergence by never exceeding ~2^45). The one intentionally unbounded
  * accumulation — membership-fingerprint sums over whole splits/clusters,
  * whose row counts scale with the corpus — goes through [[fpSum]]'s
  * decimal(38,0) accumulator instead of relying on that bound.
  *
  * These are pure `Column` expressions (codegen'd built-ins, no UDFs), so
  * they stay inside whole-stage codegen and Catalyst can push/prune around
  * them — the difference between "works on 60k rows" and "works on 100 TB".
  */
object TextFns {
  /** Large prime modulus for rolling hashes (fits arithmetic in BIGINT). */
  val P: Long = 1000000007L

  /** Unsigned 32-bit hash of a string column — native [[HashExprs]]
    * kernel, numerically identical to the declarative
    * `conv(substring(md5(x), 1, 8), 16, 10)` chain.
    * DuckDB: `('0x' || substr(md5(x), 1, 8))::BIGINT`. */
  def h32(c: Column): Column =
    call_function("h32_md5", c.cast("string"))

  /** Whitespace tokens, empties dropped — native [[WsTokens]] kernel,
    * byte-identical to `filter(split(x, " "), t -> length(t) > 0)`.
    * DuckDB: `list_filter(string_split(x, ' '), t -> len(t) > 0)`. */
  def tokens(c: Column): Column =
    call_function("ws_tokens", c.cast("string"))

  /** Word-level n-gram shingles (space-joined).
    * DuckDB: `list_transform(range(1, len(toks) - n + 2),
    *            i -> array_to_string(toks[i:i+n-1], ' '))`. */
  def shingles(toks: Column, n: Int): Column =
    // Guarded: Spark's sequence(0, -1) would count DOWN; DuckDB's
    // range(1, 0) is empty. The `when` keeps the engines aligned.
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Hashed word-level n-gram shingles in one native pass — numerically
    * identical to `transform(shingles(tokens(c), n), h32)` but without the
    * interpreted HOF chain or any intermediate strings (see
    * [[ShingleH32]]).
    * DuckDB: `list_transform(range(1, len(toks) - n + 2),
    *            i -> ('0x' || substr(md5(array_to_string(toks[i:i+n-1],
    *            ' ')), 1, 8))::BIGINT)`. */
  def shingleH32(c: Column, n: Int): Column =
    call_function("shingle_h32", c.cast("string"), lit(n))

  /** Rolling polynomial fingerprint of a string array:
    * fold (acc * b + h32(t)) % P with acc0 = 0 — native [[RollingFp]]
    * kernel, numerically identical to the declarative
    * `aggregate(transform(toks, h32), 0L, (acc, h) -> (acc*b + h) % P)`.
    * DuckDB: `list_reduce(list_prepend(0::BIGINT, list_transform(toks,
    *            t -> h32(t))), (a, b) -> (a * B + b) % P)`. */
  def rollingFp(toks: Column, b: Long = 131L): Column =
    call_function("rolling_fp", toks, lit(b))

  /** Order-independent membership fingerprint: commutative sum of per-row
    * h32 values reduced mod [[P]]. Equal multisets ⇔ equal fingerprints
    * (w.h.p. over the hash), agg state is O(1) and map-side combinable.
    *
    * The sum is accumulated in `decimal(38,0)`, NOT bigint: each h32 is
    * < 2^32, so a BIGINT sum wraps silently past ~4×10^9 members (the
    * 'train' split of a 100 TB corpus is exactly that shape), while
    * DuckDB sums BIGINT into HUGEINT — the engines would diverge right
    * where the idiom matters most. decimal(38,0) is exact to ~10^28
    * members and the single `% P` lands back in BIGINT range.
    * DuckDB: `(sum(h) % 1000000007)::BIGINT` — HUGEINT sum, HUGEINT mod,
    * then the (now always in-range) BIGINT cast. */
  def fpSum(h: Column): Column =
    (sum(h.cast("decimal(38,0)")) % P).cast("long")
}
