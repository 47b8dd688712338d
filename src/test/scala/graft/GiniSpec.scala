package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** stat10_gini endpoints against closed-form values: equal revenues give
  * exactly 0, a single whale gives exactly (n−1)/n — the two anchors of
  * the Lorenz-curve formula G = (2·Σ r·x − (n+1)·Σx) / (n·Σx).
  */
class GiniSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def gini(rows: Seq[(Long, Double)]): (Long, Long) = {
    val tmp = Files.createTempDirectory("graft-gini").toString
    rows.toDF("o_custkey", "o_totalprice").repartition(3)
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val r = SparkEntry.queries("stat10_gini")(spark, tmp).head()
    (r.getAs[Long]("n_customers"), r.getAs[Long]("gini_x1e9"))
  }

  test("equal revenues -> gini exactly 0") {
    assert(gini(Seq((1L, 25.0), (2L, 25.0), (3L, 25.0), (4L, 25.0)))
      == ((4L, 0L)))
  }

  test("single whale -> gini exactly (n-1)/n, ties and zero revenues included") {
    // four customers, one holds everything: G = 3/4
    assert(gini(Seq((1L, 0.0), (2L, 0.0), (3L, 0.0), (4L, 100.0)))
      == ((4L, 750000000L)))
    // two orders per customer aggregate before ranking
    assert(gini(Seq((1L, 0.0), (1L, 0.0), (2L, 50.0), (2L, 50.0)))
      == ((2L, 500000000L))) // G = 1/2 for (0, T) at n = 2
  }
}
