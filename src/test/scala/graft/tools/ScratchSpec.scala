package graft.tools

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Scratch: every registered dir (and everything inside it) is gone
  * after the exit-time sweep — the bench/verify/test no-debris
  * guarantee. The sweep is exercised on an ISOLATED Registry instance
  * (the same class the global hook drains): sweeping the global registry
  * mid-run would delete dirs other suites are still reading.
  */
class ScratchSpec extends AnyFunSuite {

  test("registered dirs are deleted recursively by the sweep") {
    val reg = new Scratch.Registry
    val d1 = reg.dir("scratch-spec")
    val d2 = reg.dir("scratch-spec")
    val nested = d1.resolve("a/b")
    Files.createDirectories(nested)
    Files.write(nested.resolve("f.txt"), "x".getBytes)
    Files.write(d2.resolve("g.txt"), "y".getBytes)
    assert(Files.exists(nested) && Files.exists(d2))

    reg.sweep()
    assert(!Files.exists(d1), "nested tree should be swept")
    assert(!Files.exists(d2), "sibling dir should be swept")
    // idempotent: a second sweep (hook after manual sweep) is a no-op
    reg.sweep()
  }

  test("no unmanaged temp dirs outside the registry") {
    // every createTempDirectory in the tree must route through Scratch
    // (that was the r7 /tmp leak class); st13-gold additionally does its
    // own EAGER try/finally cleanup and is allowed its direct call
    import scala.jdk.CollectionConverters._
    val allowed = Set(
      "src/main/scala/graft/tools/Scratch.scala",
      "src/main/scala/graft/streaming/EventsStream.scala", // st13: eager cleanup
      "src/test/scala/graft/tools/ScratchSpec.scala", // this grep itself
    )
    // anchor at the repo root explicitly — a bare relative "src" walks
    // the wrong tree (vacuous pass) or throws when the test JVM's cwd
    // is not the repo root (forked tests, IDE runners)
    val repoRoot = java.nio.file.Paths.get(sys.props("user.dir"))
    assert(Files.exists(repoRoot.resolve("build.sbt")),
      s"test cwd $repoRoot is not the repo root (no build.sbt) — " +
        "cannot locate src/ for the temp-dir sweep")
    val srcRoot = repoRoot.resolve("src")
    assert(Files.exists(srcRoot), s"missing $srcRoot")
    val leaky = Files.walk(srcRoot).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filterNot(p => allowed.contains(repoRoot.relativize(p).toString))
      .filter(p => new String(Files.readAllBytes(p)).contains("createTempDirectory"))
      .map(_.toString).toSeq
    assert(leaky.isEmpty,
      s"unmanaged temp dirs in: ${leaky.mkString(", ")} — use Scratch.dir")
  }
}
