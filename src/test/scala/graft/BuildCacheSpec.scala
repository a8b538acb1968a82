package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{CacheStats, RelationalQueries}

/** Fingerprinted build caches (ADVICE r9): ensureBucketedTables keys
  * its one-build-per-session cache on the source files' (name, length,
  * mtime) fingerprint, so regenerating the dataset at the SAME path
  * within one session rebuilds the bucketed tables instead of silently
  * serving stale buckets; an untouched dataset must still build only
  * once. */
class BuildCacheSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  private def copyTree(src: java.io.File, dst: java.io.File): Unit =
    if (src.isDirectory) {
      dst.mkdirs()
      src.listFiles().foreach(f => copyTree(f, new java.io.File(dst, f.getName)))
    } else {
      Files.copy(src.toPath, dst.toPath, StandardCopyOption.REPLACE_EXISTING)
    }

  test("same files -> one build; regenerated files -> rebuild") {
    // a private copy of the dataset so touching it can't disturb other suites
    val work = Files.createTempDirectory("graft_bcache").toFile
    Seq("lineitem.parquet", "orders.parquet").foreach { t =>
      copyTree(new java.io.File(GraftSpark.sf, t), new java.io.File(work, t))
    }
    val d = work.getPath

    val n0 = CacheStats.buildCount("bucketed_tables")
    RelationalQueries.ensureBucketedTables(spark, d)
    RelationalQueries.ensureBucketedTables(spark, d)
    assert(CacheStats.buildCount("bucketed_tables") - n0 === 1L,
      "unchanged dataset must build exactly once")

    // "regenerate" the dataset: bump the table file's mtime (the table
    // may be a single parquet file or a directory of part files)
    val ord = new java.io.File(work, "orders.parquet")
    val part =
      if (ord.isDirectory)
        ord.listFiles().filter(_.getName.endsWith(".parquet")).head
      else ord
    part.setLastModified(part.lastModified() + 60000L)
    RelationalQueries.ensureBucketedTables(spark, d)
    assert(CacheStats.buildCount("bucketed_tables") - n0 === 2L,
      "regenerated dataset (new mtime) must invalidate the cached build")

    // and the rebuilt key is itself stable
    RelationalQueries.ensureBucketedTables(spark, d)
    assert(CacheStats.buildCount("bucketed_tables") - n0 === 2L)
  }
}
