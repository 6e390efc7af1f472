package graft

/** Process-scoped scratch directories for queries that materialize a
  * stored index (ann03b/c/d, ann04b/05b, tx24/25) inside the query.
  *
  * Keyed by fixture basename AND the JVM's pid: two harness processes
  * running concurrently on the same fixture (e.g. bench and selfcheck)
  * must never share an index path, or one side's `mode("overwrite")`
  * delete races the other side's lazy parquet read (the round-8 ADVICE
  * finding). Within one process the path is stable, so repeated bench
  * passes reuse the same directory (each pass rewrites it — the build
  * is part of the measured query by design).
  */
object Scratch {

  private val pid: Long = ProcessHandle.current().pid()

  /** Every path this process ever handed out, reclaimed by a JVM
    * shutdown hook: scratch dirs are rewritten in place while the
    * process runs (bench passes reuse them by design) but are garbage
    * the moment it exits — without the hook every harness run leaks
    * its pid-suffixed dirs into $TMPDIR forever (the round-14 ADVICE
    * accumulation finding). Pid-scoping makes the hook safe: it only
    * ever deletes dirs no other process can be using. */
  private val issued = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => issued.forEach(p => delete(p)), "graft-scratch-cleanup"))

  /** `$TMPDIR/graft_<name>_<fixture-basename>_p<pid>`, deleted at JVM
    * exit. */
  def dir(name: String, fixtureDir: String): String = {
    hook
    val p = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_${name}_${new java.io.File(fixtureDir).getName}_p$pid").getAbsolutePath
    issued.add(p)
    p
  }

  /** Recursive delete that does NOT follow directory symlinks (a
    * planted symlink inside a scratch dir must delete the LINK, never
    * the target's contents) and tolerates a vanishing tree. */
  def delete(path: String): Unit = delete(new java.io.File(path))

  def delete(f: java.io.File): Unit = {
    if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath)) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(delete)
    }
    f.delete()
  }
}
