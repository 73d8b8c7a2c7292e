package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage cuts for the iterative operators (connected components,
  * PageRank, k-core, k-hop, BFS).
  *
  * Two durability modes, chosen by the `checkpointDir` knob every
  * iterative operator threads through:
  *
  *  - `None` → `localCheckpoint()`: blocks live in executor storage
  *    memory. Fast (no filesystem write) and right for single-JVM /
  *    short-job use — but a lost executor loses blocks that are
  *    UN-recomputable (the lineage was truncated), failing the job
  *    mid-iteration.
  *  - `Some(dir)` → reliable `checkpoint()`: blocks are written to a
  *    (HDFS-compatible) checkpoint directory and survive executor
  *    loss — the mode a 1000-executor job reading 100 TB should run,
  *    where the probability of losing SOME executor over a multi-round
  *    iteration approaches 1. Costs one distributed filesystem write
  *    per cut.
  *
  * The SparkContext has ONE checkpoint dir: the first `Some(dir)` cut
  * sets it if unset, later cuts reuse it (Spark creates a unique
  * subdirectory per checkpoint, so operators never collide). A later
  * cut requesting a DIFFERENT dir keeps the first one (logged at warn
  * — per-operator dirs would need per-operator SparkContexts).
  *
  * Reliable checkpoint files are not deleted at job end by default;
  * long-running services should set
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (best
  * effort, on RDD GC) or clean the directory between runs.
  */
object Checkpoints {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Materialize `df` and truncate its lineage, durable iff `dir` is
    * set. Both modes are eager and preserve the physical partitioning
    * (Spark's `Dataset.checkpoint` keeps `outputPartitioning` on the
    * resulting `LogicalRDD` either way), so co-partitioned iterative
    * joins keep their shuffle-free rounds in both.
    *
    * Durable mode caches the frame (MEMORY_AND_DISK) around the
    * reliable checkpoint: Spark writes checkpoint files in a SECOND
    * job after the materializing action, which would otherwise
    * recompute the whole upstream plan — 2x compute on exactly the
    * expensive joins/aggregates this knob protects. The cache makes
    * the write job a cache read; it is unpersisted as soon as the
    * checkpoint files exist.
    */
  def cut(df: DataFrame, dir: Option[String]): DataFrame = dir match {
    case None => df.localCheckpoint()
    case Some(d) =>
      val sc = df.sparkSession.sparkContext
      sc.getCheckpointDir match {
        case None => sc.setCheckpointDir(d)
        case Some(cur) if !sameCheckpointDir(sc.hadoopConfiguration, d, cur) =>
          log.warn(s"Checkpoints.cut: checkpoint dir already set to '$cur'; " +
            s"ignoring requested '$d' (one dir per SparkContext)")
        case _ => ()
      }
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try df.checkpoint()
      finally df.unpersist()
  }

  /** `SparkContext.setCheckpointDir(d)` stores a fully-qualified path
    * with a per-context UUID subdirectory appended, so the current dir
    * matches a requested one iff its PARENT equals the qualified
    * request — substring checks false-negative on qualification
    * ('file:/x' vs '/x') and false-positive on prefixes ('/tmp/a' vs
    * '/tmp/ab/<uuid>').
    */
  private def sameCheckpointDir(
      conf: org.apache.hadoop.conf.Configuration,
      requested: String,
      current: String): Boolean = {
    val req = new org.apache.hadoop.fs.Path(requested)
    val qualified = req.getFileSystem(conf).makeQualified(req)
    val curParent = new org.apache.hadoop.fs.Path(current).getParent
    qualified == curParent
  }
}
