package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Path convention for persisted ingest-once artifacts (LSH index, PQ
  * codes, BM25 postings, the textual-dedup survivor set): derive a
  * deterministic directory from the SOURCE DATA'S IDENTITY (path +
  * mtime + size) and the build parameters, so a re-provisioned source
  * or a parameter change yields a fresh key and the artifact rebuilds —
  * a path-only key would silently serve rows built from replaced data,
  * a wrong-answer class nothing downstream detects.
  *
  * All probes go through `org.apache.hadoop.fs.FileSystem`, the same
  * abstraction the [[Datastore]] uses, so the cache root can live on
  * any Hadoop-supported store (`file:`, `s3a:`, `gs:`) — set
  * `spark.graft.artifactDir` to relocate it; the default is the local
  * tmpdir, which resolves through the `file:` scheme.
  */
object ArtifactCache {

  /** Root URI for artifact directories. Spark-conf-overridable so a
    * cluster deployment points it at an object store.
    */
  def baseDir(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.artifactDir")
      .getOrElse(System.getProperty("java.io.tmpdir"))

  /** Identity string for a source file/dir: scheme-qualified path plus
    * modification time and length. A plain file takes them from its
    * own `FileStatus`; a DIRECTORY derives them from a recursive
    * listing summary (file count, total length, max file mtime) —
    * on the object stores this class advertises (`s3a:`, `gs:`) a
    * directory's own status is synthetic (mtime/len ~0), which would
    * silently degrade the key to path-only and reintroduce the
    * stale-artifact wrong-answer class the key exists to prevent. The
    * listing is the same driver-side metadata pass Spark's own file
    * index performs on read.
    */
  def sourceIdentity(spark: SparkSession, source: String): String = {
    val p = new Path(source)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val st = fs.getFileStatus(p)
    if (!st.isDirectory)
      s"${fs.makeQualified(p)}|${st.getModificationTime}:${st.getLen}"
    else {
      var (n, len, maxM) = (0L, 0L, 0L)
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val f = it.next()
        n += 1; len += f.getLen
        if (f.getModificationTime > maxM) maxM = f.getModificationTime
      }
      s"${fs.makeQualified(p)}|files:$n:$len:$maxM"
    }
  }

  /** Deterministic artifact directory for (source identity, params). */
  def path(spark: SparkSession, source: String, params: String): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${sourceIdentity(spark, source)}|$params".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    new Path(baseDir(spark), s"graft-idx-$key").toString
  }

  /** True iff the artifact directory carries its `_SUCCESS` marker —
    * i.e. a prior parquet write committed fully. A crashed writer
    * leaves no marker and the artifact rebuilds.
    */
  def isComplete(spark: SparkSession, artifactDir: String): Boolean = {
    val marker = new Path(artifactDir, "_SUCCESS")
    marker.getFileSystem(spark.sessionState.newHadoopConf()).exists(marker)
  }
}
