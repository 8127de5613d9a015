package graft

/** Single source of truth for the engine's scratch/output base dir.
  *
  * Resolution order: `SPARK_GRAFT_OUT_DIR` env var (explicit deployment
  * override) → `target/` under the enclosing sbt project root (found by
  * walking up from cwd to the nearest `build.sbt`) → cwd-relative
  * `target`. The project-root walk keeps the write-containment
  * invariant — entry points invoked with a cwd elsewhere inside the
  * checkout still write under the repo's own target dir — without
  * hardcoding any absolute checkout path.
  */
object OutDir {
  private def projectRoot: Option[java.io.File] = {
    var d = new java.io.File(".").getAbsoluteFile.getParentFile
    while (d != null && !new java.io.File(d, "build.sbt").isFile) d = d.getParentFile
    Option(d)
  }

  val base: String =
    sys.env.getOrElse(
      "SPARK_GRAFT_OUT_DIR",
      new java.io.File(projectRoot.getOrElse(new java.io.File(".")), "target").getAbsolutePath)
}
