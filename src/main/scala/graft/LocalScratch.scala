package graft

import org.apache.spark.sql.SparkSession

/** RAM-backed shuffle/spill scratch for SMALL-SF single-box runs.
  *
  * The bench/verify workloads at sf ≤ 0.1 spill a few GB per query;
  * on this box the disk write path is the one shared resource that
  * couples otherwise-independent queries (round-12 adjudication: the
  * driver bench read ×1.69 with byte-identical job counts purely from
  * disk contention, and a ktruss standalone re-run measured 58.3 s on
  * another kernel's spill debris vs 26.2 s clean). /dev/shm is tmpfs —
  * RAM-speed (measured 1.0 GB/s vs 178–470 MB/s to disk), zeroed per
  * boot, and per-process dirs are deleted by Spark on clean shutdown.
  *
  * Scope: applied by the Bench and Verify mains ONLY. The scale probes
  * keep disk scratch — their spill volumes (70+ GB at 100×) exceed
  * RAM, which is exactly the regime where tmpfs would OOM the box.
  * A real cluster submission is untouched (this is a local-mode main
  * concern; at fleet scale the equivalent lever is NVMe local dirs or
  * disaggregated shuffle, a deployment choice, not engine code).
  *
  * `SPARK_GRAFT_LOCAL_DIR=disk` opts back into the JVM default;
  * any other value is used verbatim as spark.local.dir. Guard rails:
  * falls back to the default scratch when /dev/shm is missing or has
  * < 64 GiB usable. spark.cleaner.periodicGC.interval is tightened
  * 30min → 3min so ContextCleaner actually deletes dead shuffle files
  * within a long suite run — in tmpfs, lingering shuffle files hold
  * RAM, not just disk inodes (the 48 g heap GCs too rarely on its own
  * for the cleaner to fire). */
object LocalScratch {
  private val MinUsable = 64L * 1024 * 1024 * 1024

  def fast(b: SparkSession.Builder): SparkSession.Builder =
    sys.env.get("SPARK_GRAFT_LOCAL_DIR") match {
      case Some("disk") => b
      case Some(dir)    => tuned(b).config("spark.local.dir", dir)
      case None =>
        val shm = new java.io.File("/dev/shm")
        if (shm.isDirectory && shm.canWrite && shm.getUsableSpace >= MinUsable)
          tuned(b).config("spark.local.dir", "/dev/shm/graft-scratch")
        else b
    }

  private def tuned(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.cleaner.periodicGC.interval", "3min")
}
