package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout management for co-located joins — the lever that
  * deletes the biggest shuffle in a recurring big×big join.
  *
  * A join between two tables bucketed by the join key into the same
  * bucket count is planned WITHOUT an Exchange on either side (and
  * without a Sort, if `sortBy` matches): every executor joins bucket i
  * against bucket i locally. At 100 TB this converts the nightly
  * fact×fact join from a full-cluster shuffle into a metadata-only
  * plan decision — the write-side cost is paid once, at layout time.
  *
  * Spark's bucketing rides the session catalog (`saveAsTable`), not
  * bare parquet paths — bucket metadata lives in the table definition.
  */
object Layout {

  /** Write `df` bucketed (and sorted) by `key` into `buckets` buckets
    * as a catalog-managed parquet table. Drops any previous table AND
    * its location first — an in-memory catalog forgets tables across
    * JVMs while their directories persist, and `saveAsTable` refuses
    * to adopt an orphaned location. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    deleteRecursively(new java.io.File(warehouse, table))
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }

  /** Equi join of two same-bucketed tables on `leftKey = rightKey` —
    * shuffle-free by construction (asserted in LayoutSpec). */
  def bucketedEquiJoin(spark: SparkSession, left: String, right: String,
                       leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }

  /** Hive-style partitioned layout (`dir/col=value/part-*.parquet`) —
    * the other physical-layout lever: a filter on the partition column
    * becomes directory pruning at PLANNING time, so a per-language (or
    * per-source, per-date) query over a 100-TB corpus opens only the
    * matching directories and never lists, let alone reads, the rest.
    * LayoutSpec asserts the executed plan's `PartitionFilters` carries
    * the predicate and the data filters list does NOT — pruning, not
    * row-level filtering. Choose low-cardinality columns: one dir (and
    * ≥1 file) per value is exactly the small-files trap for
    * high-cardinality keys. */
  def writePartitioned(df: DataFrame, dir: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(dir)

  def readPartitioned(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Small-files compaction — the lake-maintenance pass every
    * streaming/incremental ingest needs: thousands of tiny part files
    * (one per micro-batch per partition) degrade scans (footer reads,
    * scheduling overhead, no vectorized run length) until someone
    * rewrites them at a sane target size. Rewrites `srcDir` into
    * `destDir` targeting ⌈bytes / targetBytes⌉ files and returns the
    * output file count. Compact into a NEW directory then swap — an
    * in-place overwrite that fails mid-write loses data.
    *
    * Sizing and listing go through the Hadoop FileSystem API,
    * RECURSIVELY — a `java.io.File` top-level listing works only on
    * the local FS and sees zero bytes under a Hive-partitioned or
    * nested layout, which would silently coalesce the whole lake into
    * one file. Two layouts, two shapes:
    *  - flat source → `coalesce` — a NARROW dependency (no shuffle):
    *    each output file concatenates whole input files, so the
    *    rewrite moves every byte exactly once;
    *  - Hive-partitioned source (`col=value` directories, detected
    *    from the layout) → the partitioned layout is PRESERVED (its
    *    pruning is why it exists) via a `partitionBy` rewrite with a
    *    hash repartition on the partition columns — one shuffle, the
    *    price of re-clustering each partition's scattered micro-batch
    *    files into few writers (a coalesce would interleave partition
    *    values across tasks and re-fragment the output). */
  def compact(spark: SparkSession, srcDir: String, destDir: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    import org.apache.hadoop.fs.Path
    val srcPath = new Path(srcDir)
    val fs = srcPath.getFileSystem(spark.sessionState.newHadoopConf())
    def parquetBytes(p: Path): Seq[Long] = {
      val it = fs.listFiles(p, true) // recursive: partitioned/nested dirs
      val b = Seq.newBuilder[Long]
      while (it.hasNext) {
        val s = it.next()
        if (s.getPath.getName.endsWith(".parquet")) b += s.getLen
      }
      b.result()
    }
    // Hive partition columns, outermost first: each level of a
    // partitioned layout is a rank of `col=value` directories
    def partitionCols(p: Path): List[String] =
      fs.listStatus(p).filter(_.isDirectory)
        .map(_.getPath).find(_.getName.contains("=")) match {
        case Some(child) => child.getName.takeWhile(_ != '=') :: partitionCols(child)
        case None => Nil
      }
    val totalBytes = parquetBytes(srcPath).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(srcDir)
    val parts = partitionCols(srcPath)
    if (parts.isEmpty)
      df.coalesce(nFiles).write.mode("overwrite").parquet(destDir)
    else
      df.repartition(nFiles, parts.map(df.col): _*)
        .write.mode("overwrite").partitionBy(parts: _*).parquet(destDir)
    parquetBytes(new Path(destDir)).size
  }
}
