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
private[ingest] object ForkedJvm extends Assertions {

  private lazy val addOpens: Seq[String] =
    sys.props.get("graft.test.jdk17AddOpens") match {
      case Some(s) if s.trim.nonEmpty => s.trim.split("\\s+").toSeq
      case _ => sys.error(
        "graft.test.jdk17AddOpens is not set — build.sbt must pass its " +
          "jdk17AddOpens list into Test / javaOptions as this property")
    }

  /** Fork `mainClass` with the build's add-opens and this JVM's full
    * test classpath (Test / fork := true makes java.class.path exactly
    * that); stdout+stderr go to `logDir/out-<id>`. */
  def forkChild(mainClass: String, args: Seq[String], logDir: Path,
      id: Int): Process = {
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cmd: Seq[String] = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", sys.props("java.class.path"), mainClass) ++ args
    new ProcessBuilder(cmd: _*)
      .redirectOutput(logDir.resolve(s"out-$id").toFile)
      .redirectErrorStream(true)
      .start()
  }

  /** Wait for barrier file `p`, failing fast (with the child's log) if
    * any of `alive` dies before producing it. */
  def awaitFile(p: Path, what: String, timeoutSec: Long = 180,
      alive: Seq[Process] = Nil): Unit = {
    val deadline = System.nanoTime() + timeoutSec * 1000L * 1000L * 1000L
    while (!Files.exists(p)) {
      alive.zipWithIndex.foreach { case (proc, i) =>
        if (!proc.isAlive && !Files.exists(p))
          fail(s"child $i died before $what (exit ${proc.exitValue()}); " +
            s"log:\n" + Files.readString(p.getParent.resolve(s"out-$i")))
      }
      assert(System.nanoTime() < deadline, s"timed out waiting for $what")
      Thread.sleep(50)
    }
  }
}
