package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Brute-force equality for the nonparametric test rows (r13): the
  * gate proves Spark and DuckDB agree on the SAME decomposition —
  * this spec proves the decomposition computes the textbook
  * statistic, by recounting U and S pairwise from the raw tables
  * without the operators' rank/grouping plumbing. */
class RankStatsSpec extends SparkTestBase {

  test("q_mann_whitney: U equals the pairwise win + half-tie count") {
    import spark.implicits._
    val row = RelationalExt.qMannWhitney(spark, sfDir).head()
    val (nA, nB, uA) = (row.getLong(0), row.getLong(1),
      row.getDouble(3))
    val ab = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir)
        .where($"c_mktsegment".isin("BUILDING", "MACHINERY")),
        $"o_custkey" === $"c_custkey")
      .select($"o_totalprice", ($"c_mktsegment" === "BUILDING").as("isA"))
      .collect().map(r => (r.getDouble(0), r.getBoolean(1)))
    val a = ab.filter(_._2).map(_._1)
    val b = ab.filterNot(_._2).map(_._1)
    assert(nA == a.length && nB == b.length)
    var u2 = 0L // doubled U: win = 2, tie = 1 — integer-exact
    for (x <- a; y <- b)
      u2 += (if (x > y) 2L else if (x == y) 1L else 0L)
    assert(uA == u2.toDouble / 2.0,
      s"operator U=$uA vs brute ${u2.toDouble / 2.0}")
    // z is inside the attainable range |z| <= max at U in [0, nA*nB]
    val z = row.getDouble(4)
    assert(math.abs(z) <= math.sqrt(3.0 * nA * nB) + 1e-6)
  }

  test("q_mann_kendall: S, ties and sen recount pairwise from raw orders") {
    import spark.implicits._
    val row = RelationalExt.qMannKendall(spark, sfDir).head()
    val (nDays, sStat, sen) =
      (row.getLong(0), row.getLong(1), row.getDouble(4))
    // independent daily series: exact decimal sums per day from the
    // raw rows (each o_totalprice is a 2-dp value, exact in
    // BigDecimal.valueOf's shortest representation)
    val daily = Tables.orders(spark, sfDir)
      .select(date_format($"o_orderdate".cast("date"), "yyyy-MM-dd"),
        $"o_totalprice")
      .collect()
      .groupBy(_.getString(0))
      .map { case (d, rs) =>
        (java.time.LocalDate.parse(d).toEpochDay,
          rs.map(r => java.math.BigDecimal.valueOf(r.getDouble(1)))
            .reduce(_ add _))
      }
      .toArray.sortBy(_._1)
    assert(nDays == daily.length.toLong)
    var s2 = 0L
    val slopes = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (i <- daily.indices; j <- (i + 1) until daily.length) {
      s2 += java.lang.Integer.signum(daily(j)._2.compareTo(daily(i)._2)).toLong
      slopes += (daily(j)._2.doubleValue() - daily(i)._2.doubleValue()) /
        (daily(j)._1 - daily(i)._1).toDouble
    }
    assert(sStat == s2, s"operator S=$sStat vs brute $s2")
    val sorted = slopes.toArray.sorted
    val np = sorted.length
    val senBrute = (sorted((np - 1) / 2) + sorted(np / 2)) / 2.0
    assert(sen == math.floor(senBrute * 1e6 + 0.5) / 1e6,
      s"operator sen=$sen vs brute $senBrute")
  }
}
