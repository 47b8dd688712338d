package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-level min/max data skipping over a plain Parquet table — the
  * mechanism behind every table format's "query touches 3 of 40,000
  * files" story, built from the stats Parquet already wrote.
  *
  * `build` reads ONLY file footers (row-group metadata), never data
  * pages: indexing a 100 TB table costs one footer read per file,
  * distributed over the cluster as a task per file batch. The index
  * itself is one row per file — a 100 TB table at 256 MB/file is
  * ~400k rows, a dataframe that fits anywhere.
  *
  * `rangeScan` consults the index to hand Spark only the files whose
  * [min, max] envelope intersects the predicate. Files without stats for
  * the column are conservatively kept, so the scan is always exactly
  * equal to a full scan + filter — pruning is a pure optimization.
  */
object SkipIndex {

  private val supported: Set[DataType] =
    Set(IntegerType, LongType, FloatType, DoubleType, StringType, DateType)

  /** Build the index for `cols` over the Parquet table at `path`.
    * Output schema: (file STRING, num_rows LONG, <c>_min, <c>_max per col,
    * typed as in the table). Null min/max ⇒ the file lacks stats for that
    * column (all-null chunk, or stats disabled at write time).
    */
  def build(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    val table = spark.read.parquet(path)
    val tSchema = table.schema
    cols.foreach { c =>
      val f = tSchema(tSchema.fieldIndex(c))
      require(supported.contains(f.dataType),
        s"unsupported skip-index column type for $c: ${f.dataType.simpleString}")
    }
    val colTypes: Map[String, DataType] =
      cols.map(c => c -> tSchema(tSchema.fieldIndex(c)).dataType).toMap
    val files = table.inputFiles.toIndexedSeq
    val outSchema = StructType(
      StructField("file", StringType) +: StructField("num_rows", LongType) +:
        cols.flatMap(c => Seq(
          StructField(s"${c}_min", colTypes(c)),
          StructField(s"${c}_max", colTypes(c)))))
    val colsB = spark.sparkContext.broadcast(cols.map(c => c -> colTypes(c)))
    // footer-only read per file; a fresh Hadoop Configuration resolves
    // file:// and hdfs:// defaults — on a cluster with non-default
    // filesystem conf, broadcast the serialized conf instead
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism)))
      .map { f =>
        import org.apache.parquet.hadoop.ParquetFileReader
        import org.apache.parquet.hadoop.util.HadoopInputFile
        val conf = new org.apache.hadoop.conf.Configuration()
        val in = HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f), conf)
        val reader = ParquetFileReader.open(in)
        try {
          val blocks = reader.getFooter.getBlocks
          var numRows = 0L
          // per requested column: running (min, max) over row groups as
          // parquet-native Comparable values; null until a stat is seen
          val mins = new Array[Comparable[Any]](colsB.value.size)
          val maxs = new Array[Comparable[Any]](colsB.value.size)
          val idx = colsB.value.map(_._1).zipWithIndex.toMap
          blocks.forEach { b =>
            numRows += b.getRowCount
            b.getColumns.forEach { cc =>
              idx.get(cc.getPath.toDotString).foreach { i =>
                val st = cc.getStatistics
                if (st != null && st.hasNonNullValue) {
                  val mn = st.genericGetMin.asInstanceOf[Comparable[Any]]
                  val mx = st.genericGetMax.asInstanceOf[Comparable[Any]]
                  if (mins(i) == null || mn.compareTo(mins(i)) < 0) mins(i) = mn
                  if (maxs(i) == null || mx.compareTo(maxs(i)) > 0) maxs(i) = mx
                }
              }
            }
          }
          val vals = colsB.value.zipWithIndex.flatMap { case ((_, dt), i) =>
            Seq(fromParquet(mins(i), dt), fromParquet(maxs(i), dt))
          }
          Row.fromSeq(f +: numRows +: vals)
        } finally reader.close()
      }
    spark.createDataFrame(rows, outSchema)
  }

  /** Parquet footer statistic → external Spark value of the table type. */
  private def fromParquet(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case StringType =>
        v.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[java.lang.Integer].longValue()))
      case _ => v // INT32/INT64/FLOAT/DOUBLE stats are already the JVM type
    }

  /** Files whose [min, max] envelope intersects [lo, hi] on `colName`
    * (inclusive), plus files with no stats (conservative keep). The index
    * is file-count sized, so this is a driver-side metadata operation —
    * the same collect every table format's scan planning performs.
    */
  def candidateFiles(index: DataFrame, colName: String, lo: Any, hi: Any): Seq[String] = {
    val mn = col(s"${colName}_min")
    val mx = col(s"${colName}_max")
    index.filter(mn.isNull || mx.isNull || (mx >= lit(lo) && mn <= lit(hi)))
      .select("file").collect().map(_.getString(0)).toIndexedSeq
  }

  /** Index-pruned range scan: read only candidate files, then apply the
    * exact predicate. Result is row-identical to a full scan + filter; the
    * win is the files never opened. Returns (dataframe, filesRead,
    * filesTotal) so callers can assert the pruning actually bit.
    */
  def rangeScan(spark: SparkSession, path: String, index: DataFrame,
      colName: String, lo: Any, hi: Any): (DataFrame, Int, Int) = {
    val schema = spark.read.parquet(path).schema
    val keep = candidateFiles(index, colName, lo, hi)
    val total = index.count().toInt
    val pred = col(colName) >= lit(lo) && col(colName) <= lit(hi)
    val df =
      if (keep.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      // basePath keeps directory-derived partition columns intact when
      // addressing individual files inside a partitioned layout
      else spark.read.option("basePath", path).schema(schema)
        .parquet(keep: _*).filter(pred)
    (df, keep.size, total)
  }
}
