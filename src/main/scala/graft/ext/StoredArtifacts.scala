package graft.ext

/** Per-JVM memoization of write-once at-rest artifact trees, keyed by a
  * caller-chosen composite key (artifact kind + dataset dir + layout
  * params) — the bench-rep convention the dedup index / bucketed layout /
  * stored funnel queries established: production artifacts are
  * write-once/amortized, so timed reps measure SERVING while the build
  * cost stays honestly visible in first-rep and x100 numbers. Assumes the
  * keyed dataset dir is immutable for the JVM's lifetime — true for every
  * current caller (testdata and synthesized scale trees are never
  * rewritten inside a run).
  */
object StoredArtifacts {
  private val dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The artifact tree for `key`, building it under a fresh temp dir via
    * `build` on first use. The build runs inside computeIfAbsent, so
    * concurrent bench threads never double-build one artifact.
    */
  def of(key: String)(build: String => Unit): String =
    dirs.computeIfAbsent(key, _ => { val r = fresh(); build(r); r })

  private def fresh(): String = {
    val root = java.nio.file.Files.createTempDirectory("graft-artifact-")
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(root))
        scala.util.Using.resource(java.nio.file.Files.walk(root)) { st =>
          st.iterator().asScala.toSeq.reverse
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
    }
    root.toString
  }
}
