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
}
