package graft.util

import org.apache.spark.sql.DataFrame

/** Config-selectable lineage-truncation strategy for iterative /
  * multi-stage plans (the CC loop, the composed cleaning pipeline).
  *
  * `localCheckpoint` (the default) stores blocks on executor
  * local disk/memory — fast, but lost on executor failure, so a
  * multi-hour 100 TB run would restart the whole lineage from zero.
  * The production-scale alternative is a RELIABLE checkpoint to a
  * durable directory (HDFS/object store): set
  * `spark.graft.checkpoint.mode=reliable` and
  * `spark.graft.checkpoint.dir=<durable path>` on the session and
  * every [[stage]] call writes a recoverable checkpoint instead.
  * Output is identical either way — the strategy only changes WHERE
  * the truncated lineage's blocks live (asserted in CheckpointsSpec).
  *
  * RETENTION COST (reliable mode): every [[stage]] call writes a NEW
  * checkpoint directory and Spark never deletes old ones by default
  * (`spark.cleaner.referenceTracking.cleanCheckpoints` is false), so an
  * iterative run — e.g. a CC loop converging in R rounds over E edge
  * bytes — accumulates up to R full copies (R×E durable bytes) in the
  * checkpoint dir. On a 100 TB job, either set
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` on the
  * session (the ContextCleaner then removes a checkpoint once its RDD
  * is GC'd — safe here because each round only reads the PREVIOUS
  * round's checkpoint), or point [[DirKey]] at a per-run subdirectory
  * and delete it after job completion.
  */
object Checkpoints {

  /** "local" (default) or "reliable". Read per call, so a session can
    * flip strategies between jobs without rebuilding plans. */
  val ModeKey = "spark.graft.checkpoint.mode"

  /** Durable directory for reliable mode (required when mode=reliable;
    * must be on storage that survives executor loss — HDFS/S3/NFS on a
    * cluster, any local dir in tests). */
  val DirKey = "spark.graft.checkpoint.dir"

  /** Truncate `df`'s lineage under the session-configured strategy. */
  def stage(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get(ModeKey, "local") match {
      case "local" => df.localCheckpoint()
      case "reliable" =>
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty) {
          val dir = spark.conf.get(DirKey, "")
          require(dir.nonEmpty,
            s"$ModeKey=reliable requires $DirKey (a durable directory)")
          sc.setCheckpointDir(dir)
        }
        df.checkpoint()
      case other =>
        throw new IllegalArgumentException(
          s"$ModeKey must be 'local' or 'reliable', got '$other'")
    }
  }
}
