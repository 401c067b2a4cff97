package graft.stream

import org.apache.hadoop.fs.{FileSystem, Path}

/** Checked filesystem mutations for the maintenance paths: HDFS-style
  * filesystems report rename/delete failure by RETURNING FALSE, not
  * throwing — an unchecked call turns a failed step into silent state
  * divergence (a rename into a still-existing directory even NESTS the
  * source inside the destination). Every swap/expiry step goes through
  * these so a failure aborts loudly with the crash-safety journal or
  * fallback version still in place.
  */
private[stream] object FsOps {

  /** Failure = returned false AND the path still exists (idempotent
    * replays legitimately re-delete already-gone paths).
    */
  def deleteOrThrow(fs: FileSystem, p: Path, recursive: Boolean): Unit =
    if (!fs.delete(p, recursive) && fs.exists(p))
      throw new java.io.IOException(s"failed to delete $p")

  def renameOrThrow(fs: FileSystem, from: Path, to: Path): Unit =
    if (!fs.rename(from, to))
      throw new java.io.IOException(s"failed to rename $from -> $to")
}
