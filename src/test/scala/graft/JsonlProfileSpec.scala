package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Profile
import graft.sources.JsonlTable

/** JSONL interchange (escaping fidelity, FAILFAST contract) and the
  * data-quality profile census vs brute force. */
class JsonlProfileSpec extends SparkFunSuite {
  import spark.implicits._

  test("jsonl round trip preserves quotes, newlines, unicode, and nulls") {
    val rows = Seq(
      (1L, "plain words"),
      (2L, "with \"quotes\" and \\ backslash"),
      (3L, "line\nbreak\ttab"),
      (4L, "unicode é中文 😀"),
      (5L, null.asInstanceOf[String]))
    val df = rows.toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft_jsonl_spec_").toString + "/t"
    JsonlTable.write(df, dir, parts = 2)
    val back = JsonlTable.read(spark, dir, df.schema)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(back === rows.map { case (i, t) => i -> Option(t) }.toMap)
  }

  test("jsonl read is FAILFAST: a malformed line fails instead of nulling") {
    val dir = Files.createTempDirectory("graft_jsonl_bad_").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0.json"),
      "{\"doc_id\": 1, \"text\": \"ok\"}\nnot json at all\n".getBytes("UTF-8"))
    val ex = intercept[Exception] {
      JsonlTable.read(spark, dir,
        Seq((1L, "x")).toDF("doc_id", "text").schema).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed") ||
      Option(ex.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }

  test("profile: exact per-column census incl. nulls and empty frame") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), None),
      (Some(2L), Some("b")), (None, Some("a"))
    ).toDF("k", "s")
    val got = Profile.profile(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === Map("k" -> ((4L, 3L, 2L)), "s" -> ((4L, 3L, 2L))))
    val empty = Profile.profile(df.where(col("k") > 99), Seq("k")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(empty.toSeq === Seq((0L, 0L, 0L)))
    intercept[IllegalArgumentException] { Profile.profile(df, Seq("nope")) }
  }
}
