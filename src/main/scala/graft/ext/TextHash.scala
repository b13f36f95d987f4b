package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable deterministic token hashing shared by the dedup/similarity
  * operators and their DuckDB oracles.
  *
  * The hash is the first 12 hex chars of md5 read as a big-endian integer
  * (48 bits, fits BIGINT). Both engines compute md5 identically; Spark
  * converts hex via `conv`, the oracle SQL via an explicit strpos×16^k
  * chain (DuckDB has no conv).
  */
object TextHash {
  val Mersenne31 = 2147483647L // 2^31-1, modulus for minhash permutations

  /** 48-bit hash of a string column (codegen'd built-ins only). */
  def h48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** First `n` md5 hex chars of an expression as BIGINT, DuckDB side —
    * the one hex-decoding idiom every oracle shares (DuckDB has no conv).
    */
  def hexNSql(e: String, n: Int): String = {
    require(n >= 1 && n <= 15, s"n must be 1..15 to fit a BIGINT, got $n")
    val terms = (1 to n).map { i =>
      val mult = math.pow(16, n - i).toLong
      s"(strpos('0123456789abcdef', substr(md5($e), $i, 1)) - 1) * $mult"
    }
    s"CAST(${terms.mkString(" + ")} AS BIGINT)"
  }

  /** Same hash as DuckDB SQL over an expression string. */
  def h48Sql(e: String): String = hexNSql(e, 12)

  /** 31-bit reduction used as minhash/simhash input. */
  def h31(c: Column): Column = h48(c) % Mersenne31
  def h31Sql(e: String): String = s"(${h48Sql(e)} % ${Mersenne31})"

  /** Cheap whitespace token COUNT (`length − length(sans spaces) + 1`) —
    * the one definition for the curation gate and the budget sampler,
    * with its SQL mirror below: the pair must stay in lockstep or Spark
    * and its oracle (or gate and sampler) silently desync.
    */
  def wsTokenCount(text: Column): Column =
    (length(text) - length(replace(text, lit(" "), lit(""))) + 1).cast("long")
  def wsTokenCountSql(e: String): String =
    s"CAST(length($e) - length(replace($e, ' ', '')) + 1 AS BIGINT)"

  /** Whitespace tokens; keeps order, drops empties. */
  def tokens(text: Column): Column =
    filter(split(text, " ", -1), t => t =!= "")
  def tokensSql(e: String): String =
    s"list_filter(string_split($e, ' '), t -> t <> '')"

  /** Word k-gram shingles (from a token-array column) joined by spaces.
    *
    * Shape matters for performance: the lambda must not capture the token
    * array — `element_at(toks, i+o)` inside a `transform` lambda would
    * re-evaluate the captured `toks` expression PER ELEMENT (a ~k·L blowup
    * measured at 11s vs 1s on 5000 docs). Instead the k shifted views are
    * materialized once per row via `slice`, zipped, and the lambda only
    * touches its own struct argument. Guarded: fewer than k tokens yields
    * an empty array (Spark's `sequence(1, 0)` would otherwise descend).
    */
  def shinglesFromTokens(toks: Column, k: Int): Column = {
    val n = size(toks) - (k - 1)
    val zipped = arrays_zip((0 until k).map(o => slice(toks, lit(o + 1), n)): _*)
    when(n > 0,
      transform(zipped, s => concat_ws(" ", (0 until k).map(o => s.getField(o.toString)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Same over a DuckDB token-LIST expression (e.g. an aliased column). */
  def shinglesFromTokensSql(toks: String, k: Int): String = {
    val parts = (0 until k).map(o => s"$toks[i + $o]").mkString(" || ' ' || ")
    s"list_transform(range(1, greatest(len($toks) - ${k - 2}, 1)), i -> $parts)"
  }

  /** Fixed (a,b) affine-permutation constants for minhash signatures. */
  val MinhashPerms: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L), (998244353L, 1000000007L),
    (69069L, 362437L), (1664525L, 1013904223L),
    (22695477L, 1L), (134775813L, 1L),
    (214013L, 2531011L), (1597334677L, 51L))

  /** LSH band layout: 2 signature rows per band. The band COUNT derives
    * from the permutation count here — the one place — so the batch index
    * ([[Dedup]]), its DuckDB oracles, and the streaming probe
    * ([[graft.streaming.StreamingOps.minhashBanded]]) can never disagree
    * when MinhashPerms grows (a mirrored literal in any of them would
    * silently desync stream signatures from the at-rest index).
    */
  val MinhashRowsPerBand = 2
  def MinhashBands: Int = MinhashPerms.size / MinhashRowsPerBand

  /** The `(k1, k2)` struct band key is the AT-REST schema of every stored
    * band index and the join key of every banded operator and oracle —
    * it bakes in exactly [[MinhashRowsPerBand]] = 2 signature rows. Each
    * band-layout builder calls this guard so a constant bump without the
    * accompanying key-schema migration (struct fields, DedupIndex
    * columns, oracle sig pairs) fails loudly at first use instead of
    * silently emitting 2-row keys under a layout that claims more.
    */
  def requireTwoRowBandKey(): Unit =
    require(MinhashRowsPerBand == 2,
      s"band key schema (k1, k2) pins MinhashRowsPerBand = 2, found " +
        s"$MinhashRowsPerBand — changing it is a key-schema migration " +
        "(struct fields, at-rest index columns, oracle sig pairs), not a " +
        "constant bump")
}
