package graft.sources

import org.apache.hadoop.fs.{FileStatus, FileSystem}

/** S10: cached storage listing for service mode — the reference keeps an
  * in-memory mirror of the source tree and fully re-syncs on a slow cadence
  * (source/InMemoryStorageIndex.kt, StorageIndexManager.kt:29-95; default
  * full sync 3600 s). Between syncs the work-list planner reuses the cached
  * tree; the ledger filter makes stale entries harmless (already-processed
  * files are skipped, new files picked up at the next sync).
  */
final class StorageIndex(
    fs: FileSystem, root: String,
    fullSyncIntervalMs: Long = 3600000L) {

  private var lastSync = Long.MinValue
  private var cached: Map[String, Seq[FileStatus]] = Map.empty
  private var syncCount = 0L

  /** Current topic → files view, re-listing only when the cadence expired. */
  def topics(now: Long = System.currentTimeMillis()): Map[String, Seq[FileStatus]] =
    synchronized {
      if (lastSync == Long.MinValue || now - lastSync >= fullSyncIntervalMs) {
        cached = TopicFiles.listTopics(fs, root)
        lastSync = now
        syncCount += 1
      }
      cached
    }

  /** Force the next `topics` call to re-list (e.g. after cleaner deletes). */
  def invalidate(): Unit = synchronized { lastSync = Long.MinValue }

  def syncs: Long = synchronized(syncCount)
}
