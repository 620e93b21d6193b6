package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Cluster-survivable materialization — the repo-wide "pin this frame, it
  * has multiple consumers / cuts an iterative plan" idiom.
  *
  * `localCheckpoint(true)` (the pre-round-11 idiom at every site) is the
  * right call at local[n]: blocks live in the one executor that is also
  * the driver, and losing it IS the job dying. On a real cluster it is a
  * trap — locally-checkpointed blocks truncate lineage, so an executor
  * lost to preemption or dynamic allocation makes the data UNRECOVERABLE
  * and fails the job mid-run (Spark logs exactly this warning). A 100 TB
  * run on preemptible nodes needs the RELIABLE path.
  *
  * Mode is decided once per call from session state:
  *
  *  - local master (tests, Bench, the driver's local[32] runs): eager
  *    `localCheckpoint` — fastest, and exactly as recoverable as the JVM.
  *  - cluster master with a checkpoint dir (either `sc.setCheckpointDir`
  *    already called, or `spark.graft.checkpointDir` set — GraftSession
  *    forwards it): eager RELIABLE `checkpoint()` to that dir (HDFS /
  *    object store). Survives any executor loss; also the only option
  *    that truncates the LOGICAL plan, which the iterative operators
  *    (connected components, PageRank, k-core, BFS) rely on to keep
  *    per-round planning flat.
  *  - cluster master with NO checkpoint dir: replicated persist
  *    (MEMORY_AND_DISK_2) forced eager — survives single-executor loss
  *    and recomputes (lineage intact) on worse failures. Logged once per
  *    JVM as a degraded mode: iterative operators will re-plan against
  *    growing lineage, so long jobs should configure a checkpoint dir.
  *
  * `spark.graft.materialize` = `local` | `reliable` | `persist` overrides
  * the auto choice (test hook + operational escape hatch).
  */
object Materialize {

  private val warnedNoDir = new AtomicBoolean(false)

  def apply[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    val sc = spark.sparkContext
    def ensureDir(): Boolean = sc.getCheckpointDir.isDefined || {
      spark.conf.getOption("spark.graft.checkpointDir") match {
        case Some(dir) => sc.setCheckpointDir(dir); true
        case None => false
      }
    }
    spark.conf.getOption("spark.graft.materialize").getOrElse("auto") match {
      case "local" => ds.localCheckpoint(true)
      case "reliable" =>
        require(ensureDir(),
          "spark.graft.materialize=reliable needs sc.setCheckpointDir or spark.graft.checkpointDir")
        ds.checkpoint(true)
      case "persist" => persistEager(ds)
      case _ => // auto
        if (sc.isLocal) ds.localCheckpoint(true)
        else if (ensureDir()) ds.checkpoint(true)
        else {
          if (warnedNoDir.compareAndSet(false, true)) {
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              "Materialize: cluster master with no checkpoint dir — falling back to " +
                "replicated persist (recoverable but lineage-preserving; iterative " +
                "operators re-plan against growing lineage). Set spark.graft.checkpointDir.")
          }
          persistEager(ds)
        }
    }
  }

  private def persistEager[T](ds: Dataset[T]): Dataset[T] = {
    val p = ds.persist(StorageLevel.MEMORY_AND_DISK_2)
    p.count() // force now: every call site relies on eager one-shot compute
    p
  }

  /** `df.materialize()` syntax at call sites. */
  implicit class MaterializeOps[T](private val ds: Dataset[T]) extends AnyVal {
    def materialize(): Dataset[T] = Materialize(ds)
  }
}
