package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Dataset, Row}

/** Restart-idempotent `foreachBatch` sink protocol for 4mc/4mz directories.
  *
  * Structured Streaming's `foreachBatch` offers at-least-once delivery: after
  * a crash between the user write and the checkpoint's offset commit, the
  * same `batchId` is replayed on restart. A plain `mode("append")` write
  * therefore duplicates the replayed batch. This protocol makes the write
  * idempotent per batch id, using only filesystem primitives that are atomic
  * on HDFS-like stores (single-file rename/create):
  *
  *   1. `<out>/_commits/<batchId>` exists → the batch is already published;
  *      do nothing (the replay after a crash-after-commit case).
  *   2. Delete any `batch<id>-*` files under `<out>` — leftovers of an
  *      attempt that crashed mid-publish (crash-after-rename-before-marker).
  *   3. Write the batch to `<out>/_tmp/batch-<id>` (overwrite: clobbers a
  *      half-written previous attempt).
  *   4. Move every part file to `<out>/<rel-dir>/batch<id>-<part-name>` —
  *      the batch id in the published name is what makes step 2 able to
  *      identify this batch's files, and prevents name collisions across
  *      batches. Hive-partition subdirectories (`k=v/`) are preserved.
  *   5. Create the commit marker (atomic create-empty-file), then drop
  *      `_tmp`.
  *
  * `_tmp` and `_commits` start with '_' so Spark's file listing never
  * surfaces them to readers of the sink directory. Readers see a batch's
  * files only after their rename; a concurrent scan during step 4 can see a
  * prefix of a batch (standard lake append semantics) but never a duplicate
  * or a torn file.
  *
  * This is the same write-ahead shape as Spark's own
  * `ManifestFileCommitProtocol` for the file-stream sink, restated on plain
  * directory listing so any batch reader (Spark, DuckDB over 4mc via the
  * CLI, the reference's Hadoop input format) sees exactly-once output
  * without knowing about the manifest.
  */
object FourMcBatchCommit {

  private def commitMarker(out: Path, batchId: Long) =
    new Path(out, s"_commits/$batchId")

  def alreadyCommitted(fs: FileSystem, out: Path, batchId: Long): Boolean =
    fs.exists(commitMarker(out, batchId))

  /** Recursively collect data files under `dir`, with their paths relative
    * to it (preserving hive-partition subdirs).
    */
  private def dataFiles(fs: FileSystem, dir: Path, base: String): Seq[(Path, String)] =
    fs.listStatus(dir).toSeq.flatMap { st =>
      val name = st.getPath.getName
      if (name.startsWith("_") || name.startsWith(".")) Nil
      else if (st.isDirectory) dataFiles(fs, st.getPath, s"$base$name/")
      else Seq(st.getPath -> base)
    }

  /** Delete previously published files of `batchId` (crashed attempt). */
  private def deletePublished(fs: FileSystem, dir: Path, batchId: Long): Unit =
    if (fs.exists(dir)) fs.listStatus(dir).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && !name.startsWith("_") && !name.startsWith("."))
        deletePublished(fs, st.getPath, batchId)
      else if (!st.isDirectory && name.startsWith(s"batch$batchId-"))
        fs.delete(st.getPath, false)
    }

  /** Idempotently publish one micro-batch into `out`. `writeOpts` are passed
    * to the 4mc writer; `partitionBy` columns (if any) become hive subdirs.
    */
  def writeBatch(
      batch: Dataset[Row],
      batchId: Long,
      out: String,
      writeOpts: Map[String, String],
      partitionBy: Seq[String] = Nil
  ): Unit = {
    val conf = batch.sparkSession.sessionState.newHadoopConf()
    val outPath = new Path(out)
    val fs = outPath.getFileSystem(conf)
    val tmp = new Path(outPath, s"_tmp/batch-$batchId")
    if (alreadyCommitted(fs, outPath, batchId)) {
      // crash window: marker created but _tmp not yet dropped — clean it on
      // the replay so a crash never leaks a full copy of the batch
      fs.delete(tmp, true)
      return
    }
    deletePublished(fs, outPath, batchId)
    var w = batch.write.mode("overwrite").format("4mc")
    writeOpts.foreach { case (k, v) => w = w.option(k, v) }
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    w.save(tmp.toString)
    dataFiles(fs, tmp, "").foreach { case (src, rel) =>
      val destDir = if (rel.isEmpty) outPath else new Path(outPath, rel)
      if (rel.nonEmpty) fs.mkdirs(destDir)
      val dest = new Path(destDir, s"batch$batchId-${src.getName}")
      if (!fs.rename(src, dest))
        throw new java.io.IOException(s"failed to publish $src -> $dest")
    }
    val marker = commitMarker(outPath, batchId)
    fs.mkdirs(marker.getParent)
    fs.create(marker, false).close()
    fs.delete(tmp, true)
    // refresh the directory pruning manifest ([[graft.format.McManifest]]):
    // incremental — entries for untouched files are reused byte-for-byte,
    // so the steady-state cost is one footer read per file THIS batch
    // published. Best-effort: a failed refresh leaves a stale manifest,
    // which readers treat as partial coverage (new files always kept).
    try { graft.format.McManifest.write(out, conf); () }
    catch { case scala.util.control.NonFatal(_) => }
  }
}
