package graft.io

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Filesystem commit protocol for the durable-index maintainers — the
 * minimal optimistic-concurrency kernel a 100 TB landing zone needs,
 * built from the two primitives plain filesystems actually give you
 * (the same ones the public lakehouse log protocols are built on):
 *
 *  - **stage + rename** ([[publishAtomic]]): write the full payload
 *    into a HIDDEN `.tmp-<uuid>` sibling (Spark's committer puts the
 *    `_SUCCESS` marker inside it), then rename into the final name.
 *    Directory rename is atomic on every POSIX filesystem and HDFS, so
 *    a crashed publish leaves only an invisible tmp dir — never a
 *    half-written visible version. A taken final name means another
 *    writer won the slot: the publish FAILS VISIBLY
 *    ([[ConcurrentWriteException]]) instead of silently clobbering the
 *    winner (lost update).
 *  - **versioned store** ([[latestVersion]]/[[commitVersion]]): a
 *    dataset whose every rewrite lands as `base/v=<n>` via the CAS
 *    discipline — the caller passes the version it READ, the commit
 *    targets read+1, and a conflict (another writer committed read+1
 *    first) throws. Readers resolve the newest complete version, so
 *    they see every rewrite all-or-nothing; superseded versions are
 *    pruned only AFTER the new one is live.
 *  - **exclusive claim** ([[acquireClaim]]/[[releaseClaim]]): a
 *    create-exclusive lock file for maintainers whose drain spans
 *    multiple non-transactional appends (silver + index + ledger). A
 *    concurrent drain fails visibly at acquisition; a crashed drain
 *    leaves a stale claim that the exception names, and
 *    [[forceReleaseClaim]] recovers once the operator/scheduler knows
 *    no drain is in flight (the single-writer-per-store convention all
 *    public object-store formats document for this case).
 *
 * What this deliberately does NOT attempt: multi-writer transactions
 * across datasets without a coordination service — plain rename gives
 * single-slot CAS, which is exactly enough to turn every silent
 * lost-update into a visible error.
 */
object Commits {

  /** Another writer owns the slot/claim — retry from a fresh read. */
  final class ConcurrentWriteException(msg: String)
    extends RuntimeException(msg)

  private def hidden(name: String): Boolean =
    name.startsWith(".") || name.startsWith("_")

  /**
   * Stage a payload then atomically claim `finalDir` for it. `stage`
   * writes the COMPLETE directory contents (datasets + markers) into
   * the tmp path it is given; the subsequent rename is the commit
   * point. Throws [[ConcurrentWriteException]] if `finalDir` is
   * already taken (and removes the staged tmp).
   *
   * Rename success alone is NOT commit proof: when a racing writer
   * creates `finalDir` between our existence check and our rename,
   * Hadoop's old-API rename semantics (HDFS, and RawLocalFileSystem's
   * copy fallback) move the staged tmp INSIDE the winner's directory
   * and still return true — both writers would report success and the
   * loser's payload would be silently shadowed. So each publish stages
   * a unique hidden token file and, after the rename, requires OUR
   * token directly under `finalDir`: the identity check that turns the
   * check-then-act window back into a true single-slot CAS.
   */
  def publishAtomic(fs: FileSystem, finalDir: Path)(stage: Path => Unit): Unit = {
    val parent = finalDir.getParent
    fs.mkdirs(parent)
    val tmp = new Path(parent, s".tmp-${UUID.randomUUID().toString}")
    val token = s".commit-${UUID.randomUUID().toString}"
    try {
      stage(tmp)
      fs.create(new Path(tmp, token), false).close()
      if (fs.exists(finalDir))
        throw new ConcurrentWriteException(
          s"$finalDir already exists — a concurrent writer committed this " +
            "slot first; re-read the store and retry")
      val renamed = fs.rename(tmp, finalDir)
      if (!renamed || !fs.exists(new Path(finalDir, token))) {
        // a racing winner may have swallowed our tmp as finalDir/.tmp-*;
        // remove the stray (hidden, so readers never saw it) and lose
        val stray = new Path(finalDir, tmp.getName)
        if (fs.exists(stray)) fs.delete(stray, true)
        throw new ConcurrentWriteException(
          s"rename to $finalDir did not commit our payload — lost the " +
            "commit race; re-read the store and retry")
      }
      // the identity proof is consumed — drop the token so committed
      // dirs don't accrete stray files for non-dot-filtering consumers
      // (checksum audits, distcp diffs); the dir is provably ours now
      fs.delete(new Path(finalDir, token), false)
    } finally {
      if (fs.exists(tmp)) fs.delete(tmp, true)
    }
  }

  /** Newest COMPLETE version under `base` (a `v=<n>` dir; rename-committed
    * dirs always carry `_SUCCESS`), or None for an empty store. */
  def latestVersion(fs: FileSystem, base: Path): Option[(Int, Path)] = {
    if (!fs.exists(base)) return None
    fs.listStatus(base).filter(_.isDirectory).map(_.getPath)
      .filter(p => !hidden(p.getName) && p.getName.startsWith("v="))
      .flatMap { p =>
        scala.util.Try(p.getName.stripPrefix("v=").toInt).toOption
          .filter(_ => fs.exists(new Path(p, "_SUCCESS")))
          .map(_ -> p)
      }
      .sortBy(_._1).lastOption
  }

  /** Read the newest complete version of a versioned store, with the
    * version number the caller must hand back to [[commitVersion]]. */
  def readVersioned(
      spark: SparkSession, base: String): Option[(Int, DataFrame)] = {
    val p = new Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    latestVersion(fs, p).map { case (v, dir) =>
      (v, spark.read.parquet(dir.toString))
    }
  }

  /**
   * CAS-commit `df` as version `readVersion + 1` of the store at
   * `base` (pass readVersion = -1 when [[readVersioned]] returned
   * None). Stage-and-rename, so a crash leaves no partial version;
   * throws [[ConcurrentWriteException]] when another writer committed
   * the slot between the caller's read and this commit. Superseded
   * versions are pruned AFTER the new one is live (a crash mid-prune
   * re-prunes on the next commit). Returns the committed version.
   */
  def commitVersion(df: DataFrame, base: String, readVersion: Int): Int = {
    val spark = df.sparkSession
    val basePath = new Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next = readVersion + 1
    publishAtomic(fs, new Path(basePath, s"v=$next")) { tmp =>
      df.write.mode("overwrite").parquet(tmp.toString)
    }
    // prune strictly-older versions (complete or crash leftovers); a
    // concurrent writer's slot is always > next, so never touched
    fs.listStatus(basePath).filter(_.isDirectory).map(_.getPath)
      .filter { p =>
        p.getName.startsWith("v=") &&
          scala.util.Try(p.getName.stripPrefix("v=").toInt).toOption
            .exists(_ < next)
      }
      .foreach(fs.delete(_, true))
    next
  }

  private def claimPath(storeDir: String) =
    new Path(storeDir, "_drain.claim")

  /**
   * Acquire the store's exclusive drain claim via create-exclusive.
   * Throws [[ConcurrentWriteException]] if held: either a drain is in
   * flight, or a crashed drain left it stale — the message names the
   * file, and [[forceReleaseClaim]] recovers once the caller knows no
   * drain is running (crash recovery itself stays automatic: the
   * record/id anti-joins inside each maintainer heal a replayed batch).
   *
   * Atomicity assumption: create-exclusive is put-if-absent on HDFS
   * and POSIX filesystems (where `O_CREAT|O_EXCL` / NameNode create
   * are atomic). On S3A and similar object stores it is check-then-act
   * and does NOT serialize writers — there, run drains under an
   * external scheduler lock (the single-writer-per-store convention
   * every public object-store table format documents). Only the
   * already-exists failure maps to "claim held"; any other I/O error
   * (transient network, permission) propagates as itself so a flaky
   * store is never misreported as a concurrent drain.
   */
  def acquireClaim(spark: SparkSession, storeDir: String): Unit = {
    val p = claimPath(storeDir)
    acquireClaim(p.getFileSystem(spark.sparkContext.hadoopConfiguration),
      storeDir)
  }

  private[graft] def acquireClaim(fs: FileSystem, storeDir: String): Unit = {
    val p = claimPath(storeDir)
    fs.mkdirs(p.getParent)
    try fs.create(p, false).close()
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException |
          _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentWriteException(
          s"drain claim $p is held — another drain is in flight, or a " +
            "crashed drain left it stale; forceReleaseClaim() recovers " +
            "once no drain is running")
    }
  }

  /** Release a claim this process acquired (end of a successful drain). */
  def releaseClaim(spark: SparkSession, storeDir: String): Unit = {
    val p = claimPath(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, false)
  }

  /** Operator recovery for a stale claim after a crashed drain. */
  def forceReleaseClaim(spark: SparkSession, storeDir: String): Unit =
    releaseClaim(spark, storeDir)

  /** Run `body` under the store's exclusive drain claim — released on
    * ANY in-process exit (success or exception), so only a process
    * crash leaves it stale. The serialization fence for maintainers
    * whose drain spans multiple non-transactional appends. */
  def withClaim[T](spark: SparkSession, storeDir: String)(body: => T): T = {
    acquireClaim(spark, storeDir)
    try body finally releaseClaim(spark, storeDir)
  }
}
