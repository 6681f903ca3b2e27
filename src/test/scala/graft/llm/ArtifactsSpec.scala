package graft.llm

/** The store's two load-bearing behaviors: (1) build-once semantics —
  * the builder runs exactly once per (session, family, dataset) and a
  * half-built directory (no marker) is never trusted; (2) stale-session
  * hygiene — same-dataset directories left by other sessions are
  * deleted at build time, so tmp doesn't accrete across rounds. */
class ArtifactsSpec extends graft.SparkSpec {

  test("buildOnce runs the builder exactly once per session and marks completion") {
    val family = s"spec_${System.nanoTime()}"
    var builds = 0
    val d1 = Artifacts.buildOnce(spark, family, "/root/testdata/sf0.001") { dd =>
      builds += 1
      dd.mkdirs()
      java.nio.file.Files.writeString(dd.toPath.resolve("payload"), "x")
    }
    val d2 = Artifacts.buildOnce(spark, family, "/root/testdata/sf0.001") { _ =>
      builds += 1
    }
    assert(builds === 1, "builder re-ran despite the completion marker")
    assert(d1 === d2)
    assert(new java.io.File(d1, "_GRAFT_DONE").exists())
    assert(new java.io.File(d1, "payload").exists())
  }

  test("a directory without the completion marker is rebuilt, not trusted") {
    val family = s"spec_${System.nanoTime()}"
    // simulate a crashed half-build: directory exists, no marker
    val d = Artifacts.dir(spark, family, "/root/testdata/sf0.001")
    d.mkdirs()
    java.nio.file.Files.writeString(d.toPath.resolve("stale_partial"), "x")
    var built = false
    Artifacts.buildOnce(spark, family, "/root/testdata/sf0.001") { dd =>
      built = true
      // the half-built content must be gone before the builder runs
      assert(!new java.io.File(dd, "stale_partial").exists())
      dd.mkdirs()
    }
    assert(built)
  }

  test("stale same-dataset directories from other sessions are cleaned at build") {
    val family = s"spec_${System.nanoTime()}"
    val mine = Artifacts.dir(spark, family, "/root/testdata/sf0.001")
    // a dir another (dead) session would have left: same dataset stem,
    // different application id suffix
    val stem = mine.getName.substring(0, mine.getName.lastIndexOf("__") + 2)
    val other = new java.io.File(mine.getParentFile, stem + "dead-app-123")
    other.mkdirs()
    java.nio.file.Files.writeString(other.toPath.resolve("junk"), "x")
    Artifacts.buildOnce(spark, family, "/root/testdata/sf0.001")(_.mkdirs())
    assert(!other.exists(), "stale sibling session dir survived the build")
    assert(new java.io.File(mine, "_GRAFT_DONE").exists())
  }
}
