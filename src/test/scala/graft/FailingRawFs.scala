package graft

import java.net.URI
import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A local filesystem registered under the `failing://` scheme whose
  * MUTATING operations (create / rename / delete / mkdirs / append)
  * throw an injected IOException once a global budget is exhausted —
  * the mechanical crash-point enumerator for the swap-journal property
  * sweep (CrashPointSpec). The r10 lesson was that hand-crafted crash
  * shapes miss cases (the r9 spec missed crash-after-rename): instead
  * of choosing shapes, the spec counts every fs mutation an operation
  * performs — Spark's own committer traffic included — and re-runs it
  * once per prefix length, so a "crash" lands between EVERY pair of
  * consecutive mutations.
  *
  * Reads are never gated: a crashed process doesn't corrupt what it
  * only read, and recovery/verification must be able to inspect the
  * wreckage. Extends RawLocalFileSystem (not the checksummed
  * LocalFileSystem) so no .crc sibling files exist to drift out of
  * sync with the raw renames/deletes the journaled swaps perform.
  * State is JVM-global (companion object): Hadoop caches FS instances
  * per scheme and Spark tasks run in the same local JVM, so a single
  * budget/counter pair observes every mutation regardless of which
  * cached instance performs it. */
class FailingRawFs extends RawLocalFileSystem {
  override def getScheme: String = "failing"
  override def getUri: URI = URI.create("failing:///")

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    FailingRawFs.gate(s"create $f")
    super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def createNonRecursive(f: Path, permission: FsPermission,
      flags: java.util.EnumSet[org.apache.hadoop.fs.CreateFlag], bufferSize: Int,
      replication: Short, blockSize: Long, progress: Progressable): FSDataOutputStream = {
    FailingRawFs.gate(s"createNonRecursive $f")
    super.createNonRecursive(f, permission, flags, bufferSize, replication, blockSize, progress)
  }

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream = {
    FailingRawFs.gate(s"append $f")
    super.append(f, bufferSize, progress)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    FailingRawFs.gate(s"rename $src -> $dst")
    super.rename(src, dst)
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    FailingRawFs.gate(s"delete $f")
    super.delete(f, recursive)
  }

  override def mkdirs(f: Path): Boolean = {
    FailingRawFs.gate(s"mkdirs $f")
    super.mkdirs(f)
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    FailingRawFs.gate(s"mkdirs $f")
    super.mkdirs(f, permission)
  }
}

object FailingRawFs {
  /** Injected-crash marker, searched for in cause chains by the spec. */
  final val CrashMessage = "FailingRawFs: injected crash"

  private val budget = new java.util.concurrent.atomic.AtomicLong(Long.MaxValue)
  private val count = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Allow `n` further mutations; the (n+1)-th throws. Resets the
    * mutation counter. */
  def reset(n: Long): Unit = { budget.set(n); count.set(0L) }

  /** Mutations gated since the last [[reset]] (throwing ones included). */
  def mutations: Long = count.get()

  private[graft] def gate(op: String): Unit = {
    count.incrementAndGet()
    if (budget.decrementAndGet() < 0)
      throw new java.io.IOException(s"$CrashMessage (at: $op)")
  }
}
