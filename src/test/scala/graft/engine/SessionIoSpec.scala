package graft.engine

import graft.SparkSpec

import java.nio.file.Files

/** IO surface of the Session facade (SURVEY §2.1 sources). */
class SessionIoSpec extends SparkSpec {

  lazy val sc = Session(spark)
  import spark.implicits._

  test("textFile reads lines back (S5 text flavor, test_rdd.rs:216-283)") {
    val dir = Files.createTempDirectory("graft-io").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/test_file_0"),
      "This is some textual test data.\nCan be converted to strings and there are two lines.")
    val lines = sc.textFile(dir).collect()
    assert(lines.size == 2)
    assert(lines.exists(_.startsWith("This is some")))
  }

  test("binaryFiles yields (path, bytes) per file (S5 bytes flavor)") {
    val dir = Files.createTempDirectory("graft-bin").toString
    Files.write(java.nio.file.Paths.get(s"$dir/a.bin"), Array[Byte](1, 2, 3))
    Files.write(java.nio.file.Paths.get(s"$dir/b.bin"), Array[Byte](4, 5))
    val files = sc.binaryFiles(dir).collect().sortBy(_._1)
    assert(files.length == 2)
    assert(files(0)._2.toSeq == Seq[Byte](1, 2, 3))
    assert(files(1)._2.toSeq == Seq[Byte](4, 5))
    // extension filter (vega local_file_reader.rs:29-35) via pathGlobFilter
    Files.write(java.nio.file.Paths.get(s"$dir/c.txt"), Array[Byte](9))
    assert(sc.binaryFiles(dir, Some("*.bin")).collect().length == 2)
    assert(sc.binaryFiles(dir).collect().length == 3)
  }

  test("readCsv parses a delimited file (S8)") {
    val dir = Files.createTempDirectory("graft-csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.csv"),
      "k,v\n1,a\n2,b\n")
    val df = sc.readCsv(s"$dir/data.csv", header = true)
    assert(df.count() == 2)
    assert(df.columns.toSeq == Seq("k", "v"))
  }

  test("readParquet reads the fixture tables (S6/S7)") {
    assert(sc.readParquet(s"$sf0001/region.parquet").count() == 5)
  }

  test("foreach/foreachPartition execute without error (A11)") {
    val acc = spark.sparkContext.longAccumulator("cnt")
    sc.parallelize(1 to 10, 2).foreach(_ => acc.add(1))
    assert(acc.value == 10)
    val acc2 = spark.sparkContext.longAccumulator("parts")
    sc.parallelize(1 to 10, 2).foreachPartition(_ => acc2.add(1))
    assert(acc2.value == 2)
  }
}
