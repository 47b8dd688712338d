package graft

import graft.operators.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for degree-oriented triangle counting: an order of
  * magnitude above the bench co-purchase graph (240k edges at sf0.1),
  * including the adversarial shape the orientation exists for. Run:
  *   sbt "runMain graft.GraphScaleProbe 2000000"
  *
  * Graphs (expression-generated, no driver loop):
  *  - uniform: |E| random edges over |E|/10 vertices (avg degree ~20);
  *  - skewed:  90% of edges touch a 1000-vertex "celebrity" core —
  *    max degree ~ |E|/1000. The naive wedge join would enumerate
  *    ~(0.9|E|/1000)² wedges PER core vertex (10¹² at 2M edges, dead);
  *    orientation caps every vertex's out-degree near √|E|, so the
  *    wedge stage stays ~|E|^1.5 and finishes in seconds.
  * The uniform graph's count is also recomputed with the naive a<b<c
  * 3-way self-join to confirm equality at a size where naive is viable.
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val nEdges = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[graph-probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val nVerts = nEdges / 10
    val uniform = spark.range(nEdges).select(
      pmod(xxhash64(col("id"), lit(1)), lit(nVerts)).as("u"),
      pmod(xxhash64(col("id"), lit(2)), lit(nVerts)).as("v"))

    val skewed = spark.range(nEdges).select(
      // 90% of edges: core vertex (0..999) <-> anywhere; 10%: uniform
      when(pmod(xxhash64(col("id"), lit(3)), lit(10)) < 9,
        pmod(xxhash64(col("id"), lit(4)), lit(1000)))
        .otherwise(pmod(xxhash64(col("id"), lit(5)), lit(nVerts))).as("u"),
      pmod(xxhash64(col("id"), lit(6)), lit(nVerts)).as("v"))

    val tUniform = timed(s"uniform ${nEdges} edges: oriented count") {
      Graph.triangleCount(uniform, "u", "v").head().getLong(0)
    }
    println(s"[graph-probe]   triangles = $tUniform")

    val tSkew = timed(s"skewed (celebrity core) ${nEdges} edges: oriented count") {
      Graph.triangleCount(skewed, "u", "v").head().getLong(0)
    }
    println(s"[graph-probe]   triangles = $tSkew")

    val naive = timed("uniform: naive 3-way self-join (reference)") {
      val e = Graph.canonicalEdges(uniform, "u", "v").cache()
      e.count()
      val c = e.as("e1")
        .join(e.as("e2"), col("e1.v") === col("e2.u"))
        .join(e.as("e3"), col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
        .count()
      e.unpersist()
      c
    }
    assert(naive == tUniform, s"orientation count $tUniform != naive $naive")
    println(s"[graph-probe]   oriented == naive ($naive) OK")
    spark.stop()
  }
}
