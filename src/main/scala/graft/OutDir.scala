package graft

/** Single source of truth for the engine's scratch/output base dir.
  *
  * Resolution order: `SPARK_GRAFT_OUT_DIR` env var (explicit deployment
  * override) → cwd-relative `target` (the sbt convention). Library code
  * must never hardcode an absolute checkout path — the engine has to run
  * from any working directory on any host.
  */
object OutDir {
  val base: String =
    sys.env.getOrElse("SPARK_GRAFT_OUT_DIR", new java.io.File("target").getAbsolutePath)
}
