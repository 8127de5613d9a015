package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's ONE portable universal-hash scheme, shared by every
  * operator that must rebuild identical hash positions in the DuckDB
  * oracle ([[graft.operators.BloomJoin]] bitmap bits,
  * [[graft.text.CountMin]] grid cells; [[graft.dedup.Dedup]]'s MinHash
  * permutations predate this helper but follow the same contract):
  *
  *   lane_j(key)  = 32-bit hex lane j of md5(key), as BIGINT
  *   pos_i(key)   = ((A_i · lane_{i mod 4} + B_i) mod P) mod range
  *
  * with P = 2^31 − 1 and A_i, B_i small odd constants, so every
  * intermediate fits a BIGINT in both engines (A·lane < 2^46) and the
  * DuckDB mirror (`CAST('0x' || substr(md5(k), a, 8) AS BIGINT)`)
  * reproduces positions bit-for-bit. Keeping the arithmetic in one
  * place keeps the two engines' fragments from drifting apart.
  */
object PortableHash {

  /** Mersenne prime 2^31 − 1. */
  val P = 2147483647L

  /** Column DSL lane: hex chars [8·lane+1, 8·lane+8] of a digest col. */
  def laneCol(digest: Column, lane: Int): Column =
    conv(substring(digest, 8 * lane + 1, 8), 16, 10).cast("long")

  /** Column DSL position over `range` for hash constants (a, b). */
  def posCol(digest: Column, lane: Int, a: Long, b: Long, range: Long): Column =
    ((lit(a) * laneCol(digest, lane) + lit(b)) % lit(P)) % lit(range)

  /** Spark-SQL text fragment of the same position, over a digest
    * COLUMN NAME (for operators composing expressions as SQL text). */
  def posSqlSpark(digestCol: String, lane: Int, a: Long, b: Long, range: Long): String = {
    val l = s"CAST(conv(substring($digestCol, ${8 * lane + 1}, 8), 16, 10) AS BIGINT)"
    s"((($a * $l + $b) % $P) % $range)"
  }

  /** DuckDB fragment of the same position, over a KEY EXPRESSION (the
    * oracle side md5s the key inline). */
  def posSqlDuck(keyExpr: String, lane: Int, a: Long, b: Long, range: Long): String = {
    val l = s"CAST('0x' || substr(md5($keyExpr), ${8 * lane + 1}, 8) AS BIGINT)"
    s"((($a * $l + $b) % $P) % $range)"
  }
}
