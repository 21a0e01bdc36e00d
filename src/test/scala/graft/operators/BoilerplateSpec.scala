package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {

  import spark.implicits._

  private val B = "shared boilerplate footer"

  test("removes >maxDf paragraphs, keeps order, keeps untouched docs") {
    val docs = Seq(
      (1L, s"alpha one\n\n$B\n\nalpha two"),
      (2L, s"$B\n\nbeta content"),
      (3L, s"gamma only"),
      (4L, s"delta a\n\ndelta b\n\n$B")).toDF("doc_id", "text")
    val out = Boilerplate.removeParagraphs(docs, "doc_id", "text", maxDf = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "alpha one\n\nalpha two")
    assert(out(2L) == "beta content")
    assert(out(3L) == "gamma only")
    assert(out(4L) == "delta a\n\ndelta b")
  }

  test("df boundary: exactly maxDf docs is kept, maxDf+1 is removed") {
    val kept2 = "in two docs"
    val cut3 = "in three docs"
    val docs = Seq(
      (1L, s"$kept2\n\n$cut3\n\nu1"),
      (2L, s"$kept2\n\n$cut3\n\nu2"),
      (3L, s"$cut3\n\nu3")).toDF("doc_id", "text")
    val out = Boilerplate.removeParagraphs(docs, "doc_id", "text", maxDf = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == s"$kept2\n\nu1")
    assert(out(2L) == s"$kept2\n\nu2")
    assert(out(3L) == "u3")
  }

  test("a doc reduced to nothing survives with empty text") {
    val docs = Seq(
      (1L, B), (2L, B), (3L, B),
      (4L, s"real content\n\n$B")).toDF("doc_id", "text")
    val out = Boilerplate.removeParagraphs(docs, "doc_id", "text", maxDf = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), "no row may be dropped")
    assert(out(1L) == "" && out(2L) == "" && out(3L) == "")
    assert(out(4L) == "real content")
  }

  test("df counts DISTINCT docs: a doc repeating its own header stays intact") {
    val h = "my own header"
    val docs = Seq(
      (1L, s"$h\n\nbody\n\n$h\n\n$h"),
      (2L, "other")).toDF("doc_id", "text")
    val out = Boilerplate.removeParagraphs(docs, "doc_id", "text", maxDf = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == s"$h\n\nbody\n\n$h\n\n$h",
      "df=1 paragraph removed despite maxDf=1")
  }

  test("paragraphDf profiles df (distinct docs) and occurrences separately") {
    val docs = Seq(
      (1L, "p\n\np\n\nq"),
      (2L, "p\n\nr")).toDF("doc_id", "text")
    val prof = Boilerplate.paragraphDf(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(prof("p") == ((2L, 3L)), s"got ${prof("p")}")
    assert(prof("q") == ((1L, 1L)))
    assert(prof("r") == ((1L, 1L)))
  }

  test("probe side never shuffles: AQE broadcasts the bounded boilerplate set") {
    val docs = (0L until 200L).map(i =>
      (i, s"unique body $i\n\n$B")).toDF("doc_id", "text")
    val out = Boilerplate.removeParagraphs(docs, "doc_id", "text", maxDf = 10)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected AQE to pick a broadcast anti-join for the df>maxDf set:\n$plan")
  }
}
