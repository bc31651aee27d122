package graft

import java.util.concurrent.CountDownLatch

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Mock S3A-class filesystem for the commit-guard specs: a local FS
  * registered under the `racy://` scheme whose rename OVERWRITES an
  * existing target (POSIX rename semantics — exactly the S3A/local
  * window the manifest's existence pre-check cannot close), plus a
  * latch hook that can block the FIRST manifest rename mid-window so a
  * spec can interleave two committers deterministically. */
class RacyFs extends RawLocalFileSystem {
  override def getScheme: String = "racy"
  override def getUri: java.net.URI = java.net.URI.create("racy:///")

  override def rename(src: Path, dst: Path): Boolean = {
    val n = dst.getName
    if ((n.startsWith("m") || n.startsWith("i")) &&
        dst.getParent != null &&
        dst.getParent.getName == graft.operators.Snapshot.ManifestDir)
      RacyFs.gate match {
        case Some((arrived, release))
            if RacyFs.first.compareAndSet(false, true) =>
          arrived.countDown()
          release.await(30, java.util.concurrent.TimeUnit.SECONDS)
          ()
        case _ => ()
      }
    // POSIX File.renameTo overwrites an existing target — RawLocal
    // already does; made explicit so the mock stays racy if the
    // superclass ever grows a guard
    if (exists(dst) && getFileStatus(dst).isFile) delete(dst, false)
    super.rename(src, dst)
  }
}

object RacyFs {
  @volatile private[graft] var gate: Option[(CountDownLatch, CountDownLatch)] =
    None
  private[graft] val first = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Arm the hook: the next manifest rename blocks until `release` is
    * counted down; `arrived` fires when the victim is inside the
    * window. */
  def arm(): (CountDownLatch, CountDownLatch) = {
    first.set(false)
    val latches = (new CountDownLatch(1), new CountDownLatch(1))
    gate = Some(latches)
    latches
  }

  def disarm(): Unit = { gate = None; first.set(false) }
}
