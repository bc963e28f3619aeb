package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Derived.ensure — the shared build-once lifecycle behind the Bloom
  * index and the JSONL export: build exactly once per (source, mtime),
  * miss on a regenerated source, and never let a table filename leak
  * into the artifact path (plan-shape specs grep scan paths).
  */
class DerivedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tempSource(): String = {
    val dir = Files.createTempDirectory("derived_src")
    val f = dir.resolve("lineitem.parquet")
    Files.writeString(f, "v1")
    f.toString
  }

  test("builds once per (source, mtime); a fresh artifact is served without rebuilding") {
    val src = tempSource()
    var builds = 0
    def go() = ops.Derived.ensure(spark, "graft-derived-spec", src) { dir =>
      builds += 1
      Files.createDirectories(Paths.get(dir))
      Files.writeString(Paths.get(dir, "_SUCCESS"), "")
    }
    val d1 = go()
    val d2 = go()
    assert(builds == 1 && d1 == d2)
  }

  test("a regenerated source (same path, new mtime) misses instead of serving stale") {
    val src = tempSource()
    var builds = 0
    def go() = ops.Derived.ensure(spark, "graft-derived-spec", src) { dir =>
      builds += 1
      Files.createDirectories(Paths.get(dir))
      Files.writeString(Paths.get(dir, "_SUCCESS"), "")
    }
    val d1 = go()
    assert(new java.io.File(src).setLastModified(
      new java.io.File(src).lastModified() + 60000))
    val d2 = go()
    assert(builds == 2 && d1 != d2, "stale artifact served after source regeneration")
  }

  test("version component invalidates; artifact path never contains the source filename") {
    val src = tempSource()
    def go(v: String) = ops.Derived.ensure(spark, "graft-derived-spec", src, v) { dir =>
      Files.createDirectories(Paths.get(dir))
      Files.writeString(Paths.get(dir, "_SUCCESS"), "")
    }
    val d1 = go("")
    val d2 = go("v2")
    assert(d1 != d2, "version bump did not produce a new artifact dir")
    // the spec-grep rule: "does not scan lineitem" must not false-positive
    assert(!d1.contains("lineitem") && !d2.contains("lineitem"),
      s"table filename leaked into artifact path: $d1")
  }

  test("ensure refuses to publish a build that left no marker (atomic publish)") {
    val src = tempSource()
    val e = intercept[IllegalStateException] {
      ops.Derived.ensure(spark, "graft-derived-spec", src, "nomark") { dir =>
        Files.createDirectories(Paths.get(dir))
        Files.writeString(Paths.get(dir, "data"), "half-built")
      }
    }
    assert(e.getMessage.contains("refusing to publish"), e.getMessage)
    // nothing observable at the artifact path — readers never see the half-build
    val dir = ops.Derived.dirFor(spark, "graft-derived-spec", src, "nomark")
    assert(!Files.exists(Paths.get(dir)), "half-built artifact became visible")
    // a later good build publishes normally
    val d2 = ops.Derived.ensure(spark, "graft-derived-spec", src, "nomark") { b =>
      Files.createDirectories(Paths.get(b))
      Files.writeString(Paths.get(b, "_SUCCESS"), "")
    }
    assert(Files.exists(Paths.get(d2, "_SUCCESS")))
  }

  test("concurrent ensure single-flights: exactly one build, every caller gets the artifact") {
    val src = tempSource()
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def go() = ops.Derived.ensure(spark, "graft-derived-spec", src, "conc") { dir =>
      builds.incrementAndGet()
      Thread.sleep(150) // widen the race window the old check-then-build lost
      Files.createDirectories(Paths.get(dir))
      Files.writeString(Paths.get(dir, "_SUCCESS"), "")
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dirs = Await.result(Future.sequence((1 to 4).map(_ => Future(go()))), 60.seconds)
    assert(builds.get == 1, s"raced: ${builds.get} builds ran")
    assert(dirs.distinct.size == 1 && Files.exists(Paths.get(dirs.head, "_SUCCESS")))
  }

  test("a marker-less leftover from a crashed build is cleared and rebuilt") {
    val src = tempSource()
    val dir = ops.Derived.dirFor(spark, "graft-derived-spec", src, "crashed")
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, "partial"), "junk from a crashed run")
    val d = ops.Derived.ensure(spark, "graft-derived-spec", src, "crashed") { b =>
      Files.createDirectories(Paths.get(b))
      Files.writeString(Paths.get(b, "_SUCCESS"), "")
    }
    assert(Files.exists(Paths.get(d, "_SUCCESS")))
    assert(!Files.exists(Paths.get(d, "partial")), "crashed leftovers survived the rebuild")
  }

  test("cross-JVM publish race in the pre-rename window leaves no nested .build- subtree") {
    // ADVICE r13: if another JVM publishes between the exists(dir)
    // recheck and fs.rename, Hadoop nests tmp INSIDE the live dir and
    // returns true — a stray "<family>….build-xxxx" subtree that
    // recursive readers would pick up. Inject the racer at exactly that
    // window via the test seam and assert the published dir is clean.
    val src = tempSource()
    val dir = ops.Derived.dirFor(spark, "graft-derived-spec", src, "racewin")
    ops.Derived.preRenameHook = () => {
      // the racing JVM lands a complete artifact in the window
      Files.createDirectories(Paths.get(dir))
      Files.writeString(Paths.get(dir, "part-racer.parquet"), "racer data")
      Files.writeString(Paths.get(dir, "_SUCCESS"), "")
    }
    try {
      val d = ops.Derived.ensure(spark, "graft-derived-spec", src, "racewin") { b =>
        Files.createDirectories(Paths.get(b))
        Files.writeString(Paths.get(b, "part-ours.parquet"), "our data")
        Files.writeString(Paths.get(b, "_SUCCESS"), "")
      }
      assert(Files.exists(Paths.get(d, "_SUCCESS")))
      // the racer's complete artifact is kept (same source ⇒ same content)
      assert(Files.exists(Paths.get(d, "part-racer.parquet")))
      // and nothing got nested: no .build- subtree, no second artifact level
      val entries = Files.list(Paths.get(d)).toArray.map(_.toString)
      assert(!entries.exists(_.contains(".build-")),
        s"nested build leftovers inside published dir: ${entries.mkString(", ")}")
      assert(entries.forall(p => Files.isRegularFile(Paths.get(p))),
        s"unexpected subdirectory inside published dir: ${entries.mkString(", ")}")
    } finally ops.Derived.preRenameHook = () => ()
  }
}
