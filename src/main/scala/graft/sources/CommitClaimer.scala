package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** THE atomic slot-claim primitive behind every commit publish and
  * group flip (round-11 verdict #6): claim `target` with `tmp`'s
  * content, failing atomically iff a racer already claimed it — the
  * compare-and-swap every arm of [[Manifest.tryCommit]] and
  * [[ManifestGroup.flip]] reduces to. `tmp` is consumed either way
  * (installed on a win, deleted on a loss). The contract every arm
  * must honor:
  *
  *  - EXACTLY-ONE-WINNER: of N concurrent claims for one target, one
  *    returns true; the rest return false. Never two truths, never a
  *    silent overwrite of the winner's content.
  *  - A false return changes nothing at `target` — the loser re-reads
  *    the log and rebases or aborts (the caller's loop).
  *
  * Arms, chosen per filesystem scheme by default:
  *  - [[CommitClaimer.HardLink]] (`file:`) — POSIX `rename(2)`
  *    silently REPLACES the destination, so the claim is `link(2)`,
  *    which fails EEXIST atomically.
  *  - [[CommitClaimer.RenameNoReplace]] (HDFS-class) — rename to an
  *    existing destination returns false (the classic HDFS CAS).
  *  - An OBJECT-STORE deployment (no rename at all) supplies a
  *    conditional-put arm: `If-None-Match: *` on the target object —
  *    succeed-iff-absent, with the loser reading the winner's object
  *    afterwards. [[graft.ManifestSpec]] pins that contract with a
  *    faked store whose only atomic primitive is exactly that
  *    conditional put, proving the commit protocol needs nothing a
  *    real S3 doesn't offer.
  */
trait CommitClaimer {
  def claim(fs: FileSystem, tmp: Path, target: Path): Boolean
}

object CommitClaimer {

  /** POSIX arm: hard-link the temp onto the target — `link(2)` fails
    * EEXIST atomically where `rename(2)` would silently replace. */
  object HardLink extends CommitClaimer {
    override def claim(fs: FileSystem, tmp: Path, target: Path): Boolean =
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(target.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        fs.delete(tmp, false); true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          fs.delete(tmp, false); false
      }
  }

  /** HDFS-class arm: rename refuses an existing destination. */
  object RenameNoReplace extends CommitClaimer {
    override def claim(fs: FileSystem, tmp: Path, target: Path): Boolean =
      if (fs.rename(tmp, target)) true
      else { fs.delete(tmp, false); false }
  }
}
