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

  // ---------------------------------------------------------------- bloom

  /** Per-file Bloom index for POINT lookups — the complement of the
    * min/max envelope, which cannot prune `id = x` on a column whose
    * values interleave across files (every envelope contains x). One
    * Bloom filter per file answers "might this file contain x" with
    * false positives only, so pruning stays a pure optimization.
    *
    * Cost model: unlike `build` (footer-only), a Bloom index needs the
    * column's VALUES — one distributed scan of that single column at
    * build time (the same price every table format pays for its bloom
    * index). The index is one row per file at ~`-log2(fpp)·n/8` bytes
    * each; 1M keys at 1% fpp ≈ 1.2 MB/file.
    *
    * The per-file aggregation is genuinely per-partition imperative
    * state (a mutable bit array), so this is one of the rare RDD
    * `aggregateByKey` uses — the same mechanism `DataFrameStatFunctions
    * .bloomFilter` employs internally.
    */
  def buildBloom(spark: SparkSession, path: String, colName: String,
      expectedPerFile: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.util.sketch.BloomFilter
    val table = spark.read.parquet(path)
    val dt = table.schema(table.schema.fieldIndex(colName)).dataType
    require(Set[DataType](IntegerType, LongType, StringType).contains(dt),
      s"unsupported bloom column type for $colName: ${dt.simpleString}")
    val asKey = dt match {
      case StringType => col(colName)
      case _ => col(colName).cast(LongType)
    }
    val pairs = table
      .select(input_file_name().as("file"), asKey.as("v"))
      .filter(col("v").isNotNull)
      .rdd.map(r => (r.getString(0), r.get(1)))
    val zero = BloomFilter.create(expectedPerFile, fpp)
    val blooms = pairs.aggregateByKey(zero)(
      (bf, v) => { bf.put(v); bf },
      (a, b) => a.mergeInPlace(b))
    val rows = blooms.map { case (f, bf) =>
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      Row(f, bos.toByteArray)
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("file", StringType), StructField("bloom", BinaryType))))
  }

  /** Files that might contain `value` per the Bloom index. Driver-side
    * metadata operation, like [[candidateFiles]]: the index is file-count
    * sized. Never a false negative — a file truly containing the value is
    * always returned.
    */
  def bloomCandidateFiles(index: DataFrame, value: Any): Seq[String] = {
    import org.apache.spark.util.sketch.BloomFilter
    index.select("file", "bloom").collect().iterator.filter { r =>
      val bf = BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
      bf.mightContain(value)
    }.map(_.getString(0)).toIndexedSeq
  }

  /** Bloom-pruned point lookup: read only files that might contain the
    * key, then apply the exact equality. Row-identical to full scan +
    * filter; returns (dataframe, filesRead, filesTotal).
    */
  def pointScan(spark: SparkSession, path: String, index: DataFrame,
      colName: String, value: Any): (DataFrame, Int, Int) = {
    val schema = spark.read.parquet(path).schema
    val dt = schema(schema.fieldIndex(colName)).dataType
    val probe: Any = dt match {
      case StringType => value.toString
      case _ => value.asInstanceOf[Number].longValue()
    }
    val keep = bloomCandidateFiles(index, probe)
    val total = index.count().toInt
    val df =
      if (keep.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else spark.read.option("basePath", path).schema(schema)
        .parquet(keep: _*).filter(col(colName) === lit(value))
    (df, keep.size, total)
  }
}
