package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, StringType}
import graft.sources.Formats

/** Source/sink round-trips: every format preserves the events rows
  * bit-for-bit under an explicit schema, and the text formats quarantine
  * corrupt records instead of failing.
  */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private def base = Tables.load(spark, sfDir, "events")
    .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")

  test("parquet/orc/json/csv round-trip preserves rows exactly") {
    val df = base
    val expected = df.collect().map(_.toSeq).toSet
    Seq("parquet", "orc", "json", "csv").foreach { fmt =>
      val dir = Files.createTempDirectory(s"fmt_$fmt").toString
      Formats.write(df, dir, fmt)
      val back = Formats.read(spark, dir, fmt, df.schema)
      val got = back.collect().map(_.toSeq).toSet
      assert(got == expected, s"$fmt round-trip diverged")
    }
  }

  test("malformed JSON records land in _corrupt_record, good rows survive") {
    val dir = Files.createTempDirectory("fmt_corrupt").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0.json"),
      """{"event_id": 1, "event_type": "view"}
        |{"event_id": oops not json
        |{"event_id": 3, "event_type": "click"}
        |""".stripMargin.getBytes("UTF-8"))
    val schema = new StructType()
      .add("event_id", "long").add("event_type", StringType)
      .add(Formats.CorruptCol, StringType)
    val out = Formats.read(spark, dir, "json", schema)
      .select($"event_id", $"event_type", col(Formats.CorruptCol)).cache()
    assert(out.filter(col(Formats.CorruptCol).isNotNull).count() == 1)
    assert(out.filter($"event_id".isNotNull).count() == 2)
  }

  test("compaction shrinks a fragmented table without changing its rows") {
    val frag = Files.createTempDirectory("fmt_frag").toString + "/t"
    val compacted = Files.createTempDirectory("fmt_comp").toString + "/t"
    // 64-way write of a small table = pathological small files
    base.repartition(64).write.parquet(frag)
    val (_, nFilesBefore) = graft.sources.Maintenance.dirStats(spark, frag)
    assert(nFilesBefore >= 32)
    val nAfter = graft.sources.Maintenance.compact(
      spark, frag, compacted, targetBytes = 64L * 1024 * 1024)
    assert(nAfter == 1, s"expected 1 file, got $nAfter")
    val before = spark.read.parquet(frag).collect().map(_.toSeq).toSet
    val after = spark.read.parquet(compacted).collect().map(_.toSeq).toSet
    assert(after == before)
  }
}
