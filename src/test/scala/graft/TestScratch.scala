package graft

/** Temp directories for specs, deleted when the forked test JVM exits —
  * a full `sbt test` previously left ~40 `graft-*` dirs under /tmp (the
  * same leak class the round-8 bench fix closed for Verify/Bench).
  * Returns Path/String like `Files.createTempDirectory`; one shutdown
  * hook sweeps everything registered.
  */
object TestScratch {
  private val dirs =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.io.File]())

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.forEach { d =>
      try delete(d)
      catch { case _: Throwable => () } // never fail JVM exit over cleanup
    }
  }))

  private def delete(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(delete)
    f.delete(): Unit
  }

  /** Fresh temp dir under java.io.tmpdir, swept at JVM exit. */
  def path(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(p.toFile)
    p
  }

  def dir(prefix: String): String = path(prefix).toString
}
