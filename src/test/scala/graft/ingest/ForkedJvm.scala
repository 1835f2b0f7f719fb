package graft.ingest

import java.nio.file.{Files, Path, Paths}

import org.scalatest.Assertions

/** Shared scaffolding for specs that fork REAL child JVMs (the
  * cross-process snapshot race and crash suites): launch a main class on
  * this test JVM's classpath, and wait on file-barrier signals with
  * loud diagnostics when a child dies early.
  *
  * The `--add-opens` list comes from build.sbt via the
  * `graft.test.jdk17AddOpens` system property (Test / javaOptions) — a
  * SINGLE source of truth, so a build-side change cannot leave forked
  * children failing with confusing InaccessibleObjectException noise
  * from a drifted hand-copied mirror. */
private[graft] object ForkedJvm extends Assertions {

  private lazy val addOpens: Seq[String] =
    sys.props.get("graft.test.jdk17AddOpens") match {
      case Some(s) if s.trim.nonEmpty => s.trim.split("\\s+").toSeq
      case _ => sys.error(
        "graft.test.jdk17AddOpens is not set — build.sbt must pass its " +
          "jdk17AddOpens list into Test / javaOptions as this property")
    }

  /** A forked child bound to ITS OWN log file — death diagnostics always
    * read out-<child's id>, never an index into whatever subset of
    * children a caller happened to pass as `alive`. */
  final case class Child(proc: Process, id: Int, log: Path) {
    def isAlive: Boolean = proc.isAlive
    def exitValue(): Int = proc.exitValue()
    def waitFor(timeout: Long, unit: java.util.concurrent.TimeUnit): Boolean =
      proc.waitFor(timeout, unit)
    def destroyForcibly(): Unit = proc.destroyForcibly()
  }

  /** Fork `mainClass` with the build's add-opens and this JVM's full
    * test classpath (Test / fork := true makes java.class.path exactly
    * that); stdout+stderr go to `logDir/out-<id>`. */
  def forkChild(mainClass: String, args: Seq[String], logDir: Path,
      id: Int): Child = {
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cmd: Seq[String] = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", sys.props("java.class.path"), mainClass) ++ args
    val log = logDir.resolve(s"out-$id")
    val proc = new ProcessBuilder(cmd: _*)
      .redirectOutput(log.toFile)
      .redirectErrorStream(true)
      .start()
    Child(proc, id, log)
  }

  /** Wait for barrier file `p`, failing fast (with the child's log) if
    * any of `alive` dies before producing it. */
  def awaitFile(p: Path, what: String, timeoutSec: Long = 180,
      alive: Seq[Child] = Nil): Unit = {
    val deadline = System.nanoTime() + timeoutSec * 1000L * 1000L * 1000L
    while (!Files.exists(p)) {
      alive.foreach { c =>
        if (!c.isAlive && !Files.exists(p))
          fail(s"child ${c.id} died before $what (exit ${c.exitValue()}); " +
            s"log:\n" + Files.readString(c.log))
      }
      assert(System.nanoTime() < deadline, s"timed out waiting for $what")
      Thread.sleep(50)
    }
  }
}
