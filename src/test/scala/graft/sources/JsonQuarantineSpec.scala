package graft.sources

import org.apache.spark.sql.types.{DoubleType, LongType, StructType}

import graft.SparkSpec

/** The corrupt-record quarantine reader: one parse, two routes, no
  * silent drops — every input line lands in exactly one frame. */
class JsonQuarantineSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType()
    .add("id", LongType).add("v", DoubleType)

  test("good rows parse, corrupt lines quarantine verbatim, nothing is dropped") {
    val dir = java.nio.file.Files.createTempDirectory("jsonq").toString
    val lines = Seq(
      """{"id": 1, "v": 1.5}""",
      """{"id": 2, "v": 2.5}""",
      """{"id": 3 "v": BROKEN""", // malformed JSON
      """not json at all""",
      """{"id": 4, "v": 4.5}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in.json"),
      lines.mkString("\n").getBytes("UTF-8"))

    val s = JsonQuarantine.readSplit(spark, s"$dir/in.json", schema)
    try {
      assert(s.good.count() + s.quarantine.count() == lines.size.toLong)
      assert(s.good.select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L))
      // quarantine carries the RAW line — the replayable artifact
      val q = s.quarantine.as[String].collect().toSet
      assert(q == Set("""{"id": 3 "v": BROKEN""", "not json at all"))
    } finally s.release()
  }

  test("a fully clean file quarantines nothing; a fully broken file parses nothing") {
    val dir = java.nio.file.Files.createTempDirectory("jsonq2").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/clean.json"),
      """{"id": 9, "v": 9.0}""".getBytes("UTF-8"))
    val s1 = JsonQuarantine.readSplit(spark, s"$dir/clean.json", schema)
    try assert(s1.good.count() == 1 && s1.quarantine.isEmpty)
    finally s1.release()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/broken.json"),
      "garbage\nmore garbage".getBytes("UTF-8"))
    val s2 = JsonQuarantine.readSplit(spark, s"$dir/broken.json", schema)
    try assert(s2.good.isEmpty && s2.quarantine.count() == 2)
    finally s2.release()
  }
}
