package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Dirty-input handling (the operational side of a 100 TB ingest): a
 * malformed record must be quarantined, not kill the stage; files with
 * drifting schemas must still read as one table.
 */
class DataQualitySpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("permissive json: malformed rows land in _corrupt_record, good rows parse") {
    val dir = Files.createTempDirectory("graft_dirty_json").toString
    Files.write(Paths.get(dir, "mixed.json"),
      """{"id": 1, "v": "ok"}
        |{"id": 2, "v": "also ok"}
        |{not json at all
        |{"id": "wrong type but parseable field", "v": 3}
        |""".stripMargin.getBytes)
    val schema = new StructType()
      .add("id", LongType).add("v", StringType)
      .add("_corrupt_record", StringType)
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir).cache()
    try {
      assert(df.count() === 4)
      assert(df.filter($"_corrupt_record".isNotNull).count() === 2,
        "the unparseable line AND the type-mismatched line are quarantined")
      assert(df.filter($"id".isNotNull).count() === 2)
      // the corrupt payload is preserved verbatim for a quarantine sink
      assert(df.filter($"_corrupt_record".startsWith("{not json")).count() === 1)
    } finally { df.unpersist(); () }
  }

  test("failfast json: the same input kills the job (the strict-gate option)") {
    val dir = Files.createTempDirectory("graft_dirty_json2").toString
    Files.write(Paths.get(dir, "bad.json"),
      "{\"id\": 1}\n{broken\n".getBytes)
    val schema = new StructType().add("id", LongType)
    val ex = intercept[Exception] {
      spark.read.schema(schema).option("mode", "FAILFAST").json(dir).count()
    }
    assert(ex.getMessage != null)
  }

  test("parquet schema evolution: mergeSchema unions drifting file schemas") {
    val dir = Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$dir/p=1")
    Seq((2L, 3.5)).toDF("id", "v2").write.parquet(s"$dir/p=2")
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.columns.toSet === Set("id", "v1", "v2", "p"))
    assert(df.count() === 2)
    // rows carry null for columns their file lacks
    assert(df.filter($"v1".isNull).count() === 1)
    assert(df.filter($"v2".isNull).count() === 1)
  }
}
