package graft.util

import org.apache.spark.storage.StorageLevel

/** Size-adaptive pin level for catalog-scale cached/checkpointed tables
  * (co-purchase edge lists, order-basket tables: they grow with the fact
  * table and are each read several times).
  *
  * The g1_pagerank sf10 probe (SURVEY §"100× probe") showed neither
  * fixed level survives every scale: deserialized memory-first OOMs
  * outright on a ~30M-edge list; MEMORY_AND_DISK_SER still OOMs in the
  * concurrent cache-WRITE path (32 tasks × multi-hundred-MB buffers in
  * MemoryStore.putIteratorAsBytes, where spill accounting lags
  * allocation); DISK_ONLY survives any size by streaming blocks straight
  * to local store but costs ~2.5× at bench scale where the table
  * trivially fits in memory. So: disk when the driving fact table is
  * big (> 512 MB on disk ⇒ derived tables in the multi-GB class),
  * serialized-memory-with-spill otherwise — the same size-based
  * reasoning Spark applies to broadcast decisions. On a cluster the
  * threshold becomes executor-memory-per-core vs rows/executor; the
  * policy doesn't change. Shared by g1/g2/g3 (lineitem-driven graphs)
  * and j8 (lineitem-driven baskets); the r8 j8 sf10 kill (TaskMemory
  * page-allocation thrash under two deserialized checkpoints) is the
  * second instance of the same failure mode.
  */
object Storage {

  /** On-disk bytes of `<dir>/<fact>.parquet` (file or directory-of-parts
    * layout) — the corpus-size probe behind [[adaptiveLevel]] and the
    * graph family's pin-vs-broadcast decision. 0 when absent. */
  def factBytes(dir: String, fact: String = "lineitem"): Long = {
    val p = java.nio.file.Paths.get(dir, s"$fact.parquet")
    if (java.nio.file.Files.isDirectory(p)) {
      // Files.list holds an open directory FD until closed — callers
      // run once per query, so an unclosed stream leaks an FD per
      // bench iteration
      val st = java.nio.file.Files.list(p)
      try st.mapToLong(f =>
        try java.nio.file.Files.size(f) catch { case _: Exception => 0L })
        .sum()
      finally st.close()
    } else if (java.nio.file.Files.exists(p))
      java.nio.file.Files.size(p)
    else 0L // unknown layout → the memory-first default is the safe bet
  }

  def adaptiveLevel(dir: String, fact: String = "lineitem"): StorageLevel =
    if (factBytes(dir, fact) > (512L << 20)) StorageLevel.DISK_ONLY
    else StorageLevel.MEMORY_AND_DISK_SER
}
