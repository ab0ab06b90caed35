package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column-level building blocks. Everything here composes
  * built-in (codegen'd) functions — no UDFs — so the whole expression
  * tree stays inside WholeStageCodegen and is evaluable per-row at
  * scan time (no shuffle, no driver involvement).
  */
object Cols {

  /** Whitespace tokens, case preserved — parity with the reference's
    * DemoMapper which splits on `strings.Fields`
    * (/root/reference/mapper.go:41). */
  def wsTokens(c: Column): Column =
    filter(split(c, "\\s+"), t => length(t) > lit(0))

  /** Normalized tokens: lowercase, alnum runs only. */
  def normTokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => length(t) > lit(0))

  /** Whitespace-collapsed, lowercased, trimmed text. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Cast a float array to double before arithmetic so both engines
    * accumulate in double precision. */
  def asDouble(arr: Column): Column = transform(arr, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity of two numeric array columns (double math). */
  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a); val bd = asDouble(b)
    dot(ad, bd) / (l2norm(ad) * l2norm(bd))
  }

  /** Deterministic half-up rounding computed directly on the binary
    * double: floor(x*10^d + 0.5)/10^d. Spark's `round()` detours
    * through BigDecimal.valueOf (shortest decimal repr) and so can
    * disagree with engines that round the IEEE value (e.g. DuckDB):
    * avg = 4.475 (stored 4.47499…) → Spark round 4.48, DuckDB 4.47.
    * The same formula is used in every oracle SQL. */
  def rnd(c: Column, digits: Int): Column = {
    val f = math.pow(10, digits)
    floor(c * f + lit(0.5)) / f
  }

  /** Exact cross-engine sum of continuous doubles: the per-row value
    * stays double (bit-identical in any engine computing the same
    * expression), but accumulation runs in DECIMAL(27,10) — exact, so
    * the result cannot depend on partial-aggregation order. Without
    * this, Spark's tree aggregation vs a sequential engine's sum can
    * straddle a rounding boundary (observed: 285207.035 ± 1e-9 →
    * .03 vs .04). Oracle twin:
    * `CAST(sum(CAST((x) AS DECIMAL(27,10))) AS DOUBLE)`. */
  def xsum(c: Column): Column =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(27, 10))).cast("double")

  /** Exact-sum average (see [[xsum]]); count must equal the non-null
    * row count of `c`. */
  def xavg(c: Column): Column = xsum(c) / count(lit(1))

  /** Count of tokens from `tokens` that appear in `vocab`. */
  def hitCount(tokens: Column, vocab: Seq[String]): Column =
    size(filter(tokens, t => t.isInCollection(vocab)))
}
