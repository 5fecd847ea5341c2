package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry over a directory of STORED graft artifacts — the operational
  * complement to the per-artifact fail-fast stamps. Every persisted index
  * this library writes (MinHash band tables, SRP signatures, winnow
  * fingerprint indexes, line-dedup unit hashes, IVF-PQ stores, BPE merge
  * tables, SBO language models, NB classifiers) carries its build-time
  * conf fingerprint in parquet column
  * metadata; the individual query paths validate their OWN input at use
  * time, but an operator of a 100 TB deployment also needs the fleet view:
  * "which of the artifacts under this root were built under a conf that no
  * longer matches the live session?" — BEFORE a nightly pipeline trips a
  * dozen IllegalStateExceptions one at a time.
  *
  * [[scan]] walks the root (driver-side directory walk — bounded by the
  * artifact count, the same class of bounded driver work as the merge-table
  * collect), reads each leaf parquet directory's FOOTER SCHEMA only (no
  * data IO), and reports one row per stamped column: the artifact path,
  * stamp kind, stored fingerprint, the live conf's fingerprint for that
  * kind, and whether they drifted.
  */
object ArtifactCatalog {

  /** Stamp key → live-fingerprint provider. The ANN provider is fed the
    * stored string because the live comparison depends on whether the
    * store encodes residuals.
    */
  private val Known: Map[String, String => String] = Map(
    "graft.banding"   -> (_ => Dedup.bandingFingerprint),
    "graft.srp"       -> (_ => Dedup.srpFingerprint),
    "graft.winnow"    -> (_ => TextAnalysis.winnowFingerprintConf),
    "graft.linedd"    -> (_ => TextAnalysis.lineFingerprintConf),
    "graft.bpe"       -> (_ => Bpe.bpeFingerprint),
    "graft.unigram"   -> (_ => Unigram.unigramFingerprint),
    "graft.lm.sbo"    -> (_ => LmIndex.sboFingerprint),
    "graft.nb"        -> (stored => NbIndex.fingerprintFor(stored)),
    "graft.ann.ivfpq" -> (stored => AnnIndex.fingerprintFor(stored)))

  /** Leaf parquet directories under `root`: a dir counts as one artifact
    * when it directly holds parquet output (data files or a `_SUCCESS`
    * marker) and the walk does NOT descend further — a cell-partitioned
    * code table is ONE artifact, not one per partition directory.
    */
  private def artifactDirs(f: java.io.File): List[java.io.File] =
    if (!f.isDirectory) Nil
    else {
      val children = Option(f.listFiles).map(_.toList).getOrElse(Nil)
      val isLeaf = children.exists(c =>
        c.getName.endsWith(".parquet") || c.getName == "_SUCCESS")
      if (isLeaf) List(f) else children.flatMap(artifactDirs)
    }

  /** One row per stamped column found under `root`:
    * (path, column, kind, stored_conf, live_conf, drifted).
    */
  def scan(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val rows = artifactDirs(new java.io.File(root)).sortBy(_.getPath).flatMap { dir =>
      val schema =
        try spark.read.parquet(dir.getPath).schema
        catch { case _: Exception => org.apache.spark.sql.types.StructType(Nil) }
      schema.fields.toList.flatMap { f =>
        Known.flatMap { case (kind, live) =>
          if (f.metadata.contains(kind)) {
            val stored = f.metadata.getString(kind)
            val liveFp = live(stored)
            Some((dir.getPath, f.name, kind, stored, liveFp, stored != liveFp))
          } else None
        }
      }
    }
    rows.toDF("path", "column", "kind", "stored_conf", "live_conf", "drifted")
  }

  /** FRAGMENTATION dashboard over the artifacts under `root` — the
    * measure-before-act read for the compaction lifecycle
    * ([[PostingsIndex.compactPostings]], [[AnnIndex.compactIvfPq]],
    * [[UnifiedDedupStore.compact]]): K crawl appends leave K file sets
    * per store (and K small files per hot partition of a
    * Hive-partitioned one), and an operator schedules compaction off
    * exactly these numbers rather than tripping over decayed pruning in
    * production. One row per artifact:
    * (path, n_files, bytes, n_partitions, max_files_per_partition) —
    * `n_partitions` counts `key=`-style partition directories (0 for a
    * flat table), `max_files_per_partition` is the per-partition file
    * count ceiling (for a flat table, the whole dir's count). Driver-side
    * directory walk, bounded by artifact + file counts — on an object
    * store this is one LIST per artifact, the same bounded driver work
    * as [[scan]]'s footer reads.
    */
  def health(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    def parquetsUnder(d: java.io.File): List[java.io.File] = {
      val children = Option(d.listFiles).map(_.toList).getOrElse(Nil)
      children.filter(f => f.isFile && f.getName.endsWith(".parquet")) :::
        children.filter(_.isDirectory).flatMap(parquetsUnder)
    }
    val rows = artifactDirs(new java.io.File(root)).sortBy(_.getPath).map { dir =>
      val parts = Option(dir.listFiles).map(_.toList).getOrElse(Nil)
        .filter(d => d.isDirectory && d.getName.contains("="))
      val files = parquetsUnder(dir)
      val maxPerPart =
        if (parts.isEmpty) files.size
        else parts.map(p => parquetsUnder(p).size).max
      (dir.getPath, files.size.toLong, files.map(_.length).sum,
        parts.size.toLong, maxPerPart.toLong)
    }
    rows.toDF("path", "n_files", "bytes", "n_partitions",
      "max_files_per_partition")
  }
}
