package graft.tools

import org.apache.spark.sql.SparkSession

/** S9 distcp analog (reference `aegisthus-distcp/src/main/java/
  * Distcp.java:42-341`): bulk file staging as a Spark job — the copy
  * list is round-robin partitioned across at most `MaxPartitions`
  * tasks (the reference's 800-reducer cap) and each task streams
  * src → dst through the Hadoop FS API, optionally decompressing
  * snappy-compressed backups (Priam-style). Each file commits via
  * write-to-temp + rename, so a retried/speculated task never leaves
  * a partially-written destination visible. Engine-external utility,
  * same as in the reference. */
object ParallelCopy {
  val MaxPartitions = 800

  /** Manifest-driven staging (the reference's `-manifest` option,
    * `Distcp.java:88,263-271`): the manifest is a newline-separated
    * list of source URIs. Destinations preserve the path suffix below
    * `preserveBase` when given (the reference's `-recursive` option),
    * else files land flat in `destDir` by name. Blank lines are
    * skipped; manifest entries are copied verbatim (the reference
    * filters secondary indexes only in its discovery branch, not the
    * manifest branch). */
  def copyFromManifest(
      spark: SparkSession,
      manifestPath: String,
      destDir: String,
      preserveBase: Option[String] = None,
      partitions: Int = 32,
      decompressSnappy: Boolean = false): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val mp = new org.apache.hadoop.fs.Path(manifestPath)
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(
      mp.getFileSystem(conf).open(mp), java.nio.charset.StandardCharsets.UTF_8))
    val srcs = try
      Iterator.continually(in.readLine()).takeWhile(_ != null)
        .map(_.trim).filter(_.nonEmpty).toVector
    finally in.close()
    val dest = destDir.stripSuffix("/")
    val pairs = srcs.map { src =>
      val suffix = preserveBase match {
        case Some(base) =>
          val b = base.stripSuffix("/") + "/"
          require(src.startsWith(b), s"manifest entry $src is outside preserveBase $base")
          src.stripPrefix(b)
        case None => new org.apache.hadoop.fs.Path(src).getName
      }
      src -> s"$dest/$suffix"
    }
    // two sources mapping to one destination (same basename in flat
    // mode) would race their commits and silently drop a file
    val dups = pairs.groupBy(_._2).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"manifest entries collide on destination(s): ${dups.take(3).mkString(", ")} — " +
        "use preserveBase to retain directory structure")
    copy(spark, pairs, partitions, decompressSnappy)
  }

  def copy(
      spark: SparkSession,
      srcToDst: Seq[(String, String)],
      partitions: Int = 32,
      decompressSnappy: Boolean = false): Unit = {
    import spark.implicits._
    val n = math.min(math.min(partitions, srcToDst.size max 1), MaxPartitions)
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    spark.createDataset(srcToDst).repartition(n).foreachPartition {
      (it: Iterator[(String, String)]) =>
        val conf = hconf.value
        // attempt-unique temp suffix: a speculative/zombie duplicate of
        // this task must never share a temp file with the live attempt
        val tc = org.apache.spark.TaskContext.get()
        val attemptTag =
          if (tc == null) java.util.UUID.randomUUID().toString
          else tc.taskAttemptId().toString
        it.foreach { case (src, dst) =>
          val srcPath = new org.apache.hadoop.fs.Path(src)
          val dstPath = new org.apache.hadoop.fs.Path(dst)
          val tmpPath = new org.apache.hadoop.fs.Path(
            dstPath.getParent, s".${dstPath.getName}.__copying__.$attemptTag")
          val dstFs = dstPath.getFileSystem(conf)
          val in0 = srcPath.getFileSystem(conf).open(srcPath)
          val in: java.io.InputStream =
            if (decompressSnappy) new org.xerial.snappy.SnappyInputStream(in0) else in0
          val out = dstFs.create(tmpPath, true)
          try {
            val buf = new Array[Byte](1 << 20)
            var r = in.read(buf)
            while (r >= 0) { if (r > 0) out.write(buf, 0, r); r = in.read(buf) }
          } finally { in.close(); out.close() }
          if (dstFs.exists(dstPath)) dstFs.delete(dstPath, false)
          if (!dstFs.rename(tmpPath, dstPath)) {
            // a concurrent duplicate attempt committed identical bytes
            // between our delete and rename — drop our copy
            if (dstFs.exists(dstPath)) dstFs.delete(tmpPath, false)
            else throw new java.io.IOException(s"commit rename failed: $tmpPath -> $dstPath")
          }
        }
    }
  }
}
