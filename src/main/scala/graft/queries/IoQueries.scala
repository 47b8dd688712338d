package graft.queries

import graft.operators.Multimodal
import graft.sources.IO
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scan/sink operator coverage (SURVEY.md §2.1) expressed as round-trips
  * the oracle can verify: the engine writes with its own sink, reads back
  * with its own scan, and the result must equal what DuckDB computes from
  * the original table — proving the storage path is lossless and the
  * partition layout is correct.
  */
object IoQueries {

  import QueryDef.t

  private def qtmp(name: String): String = s"target/qtmp/$name"

  val all: Seq[QueryDef] = Seq(

    // S4 — date-partitioned snappy parquet sink + partition-discovering
    // scan: per-partition counts must survive the round-trip.
    QueryDef("s4_parquet_partitioned_sink",
      (s, dir) => {
        val out = qtmp("s4")
        val events = t(s, dir, "events")
          .withColumn("date", date_format(col("ts"), "yyyy-MM-dd"))
        IO.writeCuratedParquet(events, out)
        s.read.parquet(out)
          .groupBy("date").agg(count(lit(1)).as("cnt"))
          .orderBy("date")
      },
      Some("SELECT strftime(ts, '%Y-%m-%d') AS date, count(*) AS cnt FROM events GROUP BY 1 ORDER BY date")),

    // S9/S1 — NDJSON raw-zone sink + schema-explicit scan round-trip.
    QueryDef("s9_ndjson_roundtrip",
      (s, dir) => {
        val out = qtmp("s9")
        val proj = t(s, dir, "events").select(
          col("event_id"), col("user_id"), col("event_type"), col("value"),
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("ts_iso"))
        IO.writeNdjson(proj, out, Seq.empty)
        val schema = StructType(Seq(
          StructField("event_id", LongType), StructField("user_id", LongType),
          StructField("event_type", StringType), StructField("value", DoubleType),
          StructField("ts_iso", StringType)))
        IO.readNdjson(s, schema, out).orderBy("event_id")
      },
      Some("SELECT event_id, user_id, event_type, value, strftime(ts, '%Y-%m-%dT%H:%M:%S') AS ts_iso FROM events ORDER BY event_id")),

    // G1 — parallel-array zip-flatten: rows → per-group parallel arrays →
    // arrays_zip + explode back to rows; identity proves index alignment.
    QueryDef("g1_zip_flatten",
      (s, dir) => {
        val arrs = t(s, dir, "events")
          .groupBy("event_type")
          .agg(array_sort(collect_list(struct(col("event_id"), col("value")))).as("arr"))
          .select(col("event_type"),
            transform(col("arr"), x => x.getField("event_id")).as("ids"),
            transform(col("arr"), x => x.getField("value")).as("vals"))
        arrs.select(col("event_type"),
            explode(arrays_zip(col("ids"), col("vals"))).as("z"))
          .select(col("event_type"), col("z.ids").as("event_id"), col("z.vals").as("value"))
          .orderBy("event_id")
      },
      Some("SELECT event_type, event_id, value FROM events ORDER BY event_id")),

    // S5/S6/S7 — catalog serving path: external-table DDL over a
    // partitioned layout + MSCK REPAIR + query through spark.table with a
    // partition-pruning predicate. Counts must match DuckDB on the raw
    // relation, proving registration and repair lose nothing.
    QueryDef("s7_catalog_table",
      (s, dir) => {
        val out = qtmp("s7")
        val events = t(s, dir, "events")
          .withColumn("date", date_format(col("ts"), "yyyy-MM-dd"))
        IO.writeCuratedParquet(events, out)
        IO.createExternalTable(s, "graft_events_cat", "PARQUET",
          events.schema, Seq("date"), out)
        s.table("graft_events_cat")
          .filter(col("date") >= "2024-01-15") // partition-pruned scan
          .groupBy("date").agg(count(lit(1)).as("cnt"))
          .orderBy("date")
      },
      Some("SELECT strftime(ts, '%Y-%m-%d') AS date, count(*) AS cnt FROM events WHERE strftime(ts, '%Y-%m-%d') >= '2024-01-15' GROUP BY 1 ORDER BY date")),

    // Skew mitigation — two-phase salted aggregation; result identical to
    // the direct groupBy so the oracle verifies the rewrite.
    QueryDef("k1_salted_groupby",
      (s, dir) => graft.operators.Skew.saltedGroupAgg(
        t(s, dir, "events"), "user_id",
        col("value").cast("decimal(18,2)"), col("event_id"), salts = 16)
        .select(col("user_id"), col("cnt"), col("total").cast("double").as("total"))
        .orderBy("user_id"),
      Some("""SELECT user_id, count(*) AS cnt,
             |CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin.replace("\n", " "))),

    // Multimodal feature extraction (rows-only: binary payloads are not a
    // DuckDB-comparable surface; MultimodalSpec covers the semantics).
    QueryDef("m1_media_features",
      (s, dir) => {
        import s.implicits._
        Multimodal.extractFeatures(Multimodal.syntheticMedia(s, 200))
          .select(col("media_id"), col("n_bytes"), col("decode_ok"))
          .orderBy("media_id")
      },
      None)
  )
}
