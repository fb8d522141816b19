package graft.sources

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** S10: cached storage listing for service mode, mirroring the reference's
  * three-cadence index (source/StorageIndexManager.kt:28-95,
  * config/StorageIndexConfig.kt:3-12):
  *
  *  - **full sync** (default 3600 s): complete recursive re-list; the cache
  *    is REPLACED, so deletions and renames are reflected.
  *  - **incremental update** (every other call): each known non-empty leaf
  *    directory is listed only past its last-seen filename — the
  *    `startAfter` marker of StorageIndexManager.updateLevel:57-63 (S3
  *    ListObjectsV2 `start-after`: the response carries only keys after the
  *    marker, so a directory holding millions of processed files costs one
  *    short page per tick instead of a full page-through). Results are
  *    merged (add-only); stale entries are harmless because the ledger
  *    filter skips already-processed files.
  *  - **empty-directory rescan** (default 900 s): directories with no files
  *    yet — and brand-new topic/partition directories — are only discovered
  *    by walking the directory levels, so that walk runs on its own slower
  *    cadence (StorageIndexManager.updateLevel rescanEmpty branch).
  *
  * The generic Hadoop `FileSystem` API has no `startAfter` parameter, so the
  * marker is applied client-side per directory here; an S3-specific
  * SourceStorage would pass it to the LIST call itself. The cadence/merge
  * semantics — what the rest of the pipeline observes — are identical.
  */
final class StorageIndex(
    fs: FileSystem, root: String,
    fullSyncIntervalMs: Long = 3600000L,
    emptyDirSyncIntervalMs: Long = 900000L) {

  private var lastFullSync = Long.MinValue
  private var lastEmptySync = Long.MinValue
  // leaf directory -> its .avro files sorted by name; the last element is
  // the startAfter marker. Empty value = known-but-empty directory (watched
  // on the empty cadence only).
  private var dirs: Map[Path, Vector[FileStatus]] = Map.empty
  private var fullSyncCount = 0L
  private var incrementalSyncCount = 0L

  private def isAvro(st: FileStatus): Boolean =
    st.isFile && st.getPath.getName.endsWith(".avro") &&
      !st.getPath.toString.contains("+tmp")

  /** Current topic → files view under the cadence rules above. */
  def topics(now: Long = System.currentTimeMillis()): Map[String, Seq[FileStatus]] =
    synchronized {
      if (lastFullSync == Long.MinValue || now - lastFullSync >= fullSyncIntervalMs)
        fullSync(now)
      else
        incrementalSync(rescanEmpty = now - lastEmptySync >= emptyDirSyncIntervalMs, now)
      toTopics
    }

  /** Force the next `topics` call to fully re-list (e.g. after cleaner
    * deletes — add-only merging would never drop the removed entries).
    */
  def invalidate(): Unit = synchronized { lastFullSync = Long.MinValue }

  /** Full re-lists performed (the expensive op to watch at bucket scale). */
  def syncs: Long = synchronized(fullSyncCount)

  /** Marker-based incremental updates performed. */
  def incrementalSyncs: Long = synchronized(incrementalSyncCount)

  /** Ordering key for the startAfter-marker discipline. Raw lexicographic
    * names break on UNPADDED offsets ("t+0+1000.avro" < "t+0+999.avro"),
    * so every file added after a digit-length rollover would be invisible
    * to incremental sync until the next full re-list; order by the PARSED
    * (topic, partition, fromOffset) with the name as the final tiebreak,
    * and sort unparseable names after all parseable ones.
    */
  private def fileKey(name: String): (Int, String, Int, Long, String) =
    TopicFiles.parseFilename(name) match {
      case Some(r) => (0, r.topic, r.partition, r.from, name)
      case None => (1, name, 0, 0L, name)
    }
  private val keyOrd = Ordering.Tuple5[Int, String, Int, Long, String]

  private def fullSync(now: Long): Unit = {
    val rootPath = new Path(root)
    val buf = scala.collection.mutable.ArrayBuffer.empty[FileStatus]
    if (fs.exists(rootPath)) {
      val it = fs.listFiles(rootPath, true)
      while (it.hasNext) {
        val st = it.next()
        if (isAvro(st)) buf += st
      }
    }
    dirs = buf.toVector.groupBy(_.getPath.getParent)
      .map { case (d, fss) => d -> fss.sortBy(st => fileKey(st.getPath.getName))(keyOrd) }
    lastFullSync = now
    lastEmptySync = now
    fullSyncCount += 1
  }

  private def incrementalSync(rescanEmpty: Boolean, now: Long): Unit = {
    incrementalSyncCount += 1
    // known non-empty leaf dirs: merge entries past the startAfter marker
    dirs = dirs.map {
      case (dir, files) if files.nonEmpty =>
        val marker = fileKey(files.last.getPath.getName)
        val fresh =
          try fs.listStatus(dir).toVector.filter(st =>
            isAvro(st) && keyOrd.gt(fileKey(st.getPath.getName), marker))
          catch { case _: java.io.FileNotFoundException => Vector.empty }
        dir -> (if (fresh.isEmpty) files
                else files ++ fresh.sortBy(st => fileKey(st.getPath.getName))(keyOrd))
      case kv => kv
    }
    if (rescanEmpty) {
      // walk directory levels to find new topic/partition dirs and fill
      // known-empty ones — the only way new directories become visible
      // between full syncs
      val rootPath = new Path(root)
      if (fs.exists(rootPath)) {
        val stack = scala.collection.mutable.Stack(rootPath)
        val found = scala.collection.mutable.ArrayBuffer.empty[(Path, Vector[FileStatus])]
        while (stack.nonEmpty) {
          val d = stack.pop()
          val entries = try fs.listStatus(d).toVector
                        catch { case _: java.io.FileNotFoundException => Vector.empty }
          entries.foreach { st =>
            if (st.isDirectory && st.getPath.getName != "+tmp") stack.push(st.getPath)
          }
          val known = dirs.get(d).exists(_.nonEmpty)
          if (!known) {
            val avro = entries.filter(isAvro)
            if (avro.nonEmpty || dirs.contains(d) || entries.exists(!_.isDirectory))
              found += d -> avro.sortBy(st => fileKey(st.getPath.getName))(keyOrd)
          }
        }
        dirs = dirs ++ found
      }
      lastEmptySync = now
    }
  }

  private def toTopics: Map[String, Seq[FileStatus]] =
    dirs.valuesIterator.flatten.toVector
      .groupBy(_.getPath.getParent.getParent.getName)
      .map { case (t, fss) => t -> fss.sortBy(_.getPath.toString) }
}
