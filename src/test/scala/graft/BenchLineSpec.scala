package graft

import org.scalatest.funsuite.AnyFunSuite

/** The official bench line is the one output the harness machine-parses
  * from a 2000-char stdout tail — pin its contract: fits the budget,
  * valid JSON-shaped fields, and value ≈ sum(queries) + rest even under
  * adversarial name-length/timing mixes.
  */
class BenchLineSpec extends AnyFunSuite {

  private def fields(line: String): (Double, Int, Int, Double, Map[String, Double]) = {
    def num(key: String): Double =
      s""""$key":(-?[0-9.]+)""".r.findFirstMatchIn(line).get.group(1).toDouble
    val qs = s""""queries":\\{([^}]*)\\}""".r.findFirstMatchIn(line).get.group(1)
    val m = if (qs.isEmpty) Map.empty[String, Double]
      else qs.split(",").map { e =>
        val Array(k, v) = e.split(":")
        k.replaceAll("\"", "") -> v.toDouble
      }.toMap
    (num("value"), num("n").toInt, num("omitted").toInt, num("rest"), m)
  }

  test("line fits the budget and preserves the sum invariant") {
    // adversarial mix: long-named slow queries interleaved with
    // short-named fast ones — the case where a non-prefix pack would
    // break value == sum(queries) + rest
    val results = (1 to 150).map { i =>
      val name = if (i % 2 == 0) s"x_${"verylongname" * 3}_$i" else s"q$i"
      name -> (if (i % 3 == 0) 5.0 + i * 0.01 else 0.1)
    }
    val line = Bench.officialLine(results, "/root/testdata/sf0.1")
    assert(line.length <= 1700, s"line ${line.length} chars")
    val (value, n, omitted, rest, qs) = fields(line)
    assert(n == 150)
    assert(qs.size + omitted == n)
    val sum = qs.values.sum + rest
    // 2dp rounding error accumulates at most 0.005 per entry
    assert(math.abs(sum - value) <= 0.005 * (qs.size + 2) + 0.01,
      s"value $value vs sum(queries)+rest $sum")
    // the kept set must be the SLOWEST queries: every kept time >= every
    // omitted time (prefix-of-sorted property)
    val keptMin = qs.values.min
    val omittedTimes = results.filterNot(r => qs.contains(r._1)).map(_._2)
    assert(omittedTimes.forall(_ <= keptMin + 1e-9))
  }

  test("empty and tiny result sets stay well-formed") {
    val empty = Bench.officialLine(Seq.empty, "/x")
    assert(empty.contains(""""n":0""") && empty.contains(""""queries":{}"""))
    val one = Bench.officialLine(Seq("q1" -> 1.234), "/x")
    val (value, n, omitted, rest, qs) = fields(one)
    assert(n == 1 && omitted == 0 && rest == 0.0 && qs == Map("q1" -> 1.23))
    assert(math.abs(value - 1.23) <= 0.005)
  }

  test("warm reruns ride the line without breaking budget or invariants") {
    val results = (1 to 150).map(i => s"q$i" -> (if (i <= 10) 9.0 else 0.2))
    val warm = (1 to 10).map(i => s"q$i" -> 1.1)
    val line = Bench.officialLine(results, "/x", warm)
    assert(line.length <= 1700, s"line ${line.length} chars")
    val w = """"warm":\{([^}]*)\}""".r.findFirstMatchIn(line).get.group(1)
    assert(w.split(",").length == 10, s"warm entries: $w")
    assert(w.contains("\"q1\":1.10"))
    val (value, n, omitted, _, qs) = fields(line)
    assert(n == 150 && qs.size + omitted == n)
    // warm times are a second sample, never folded into the cold total
    assert(math.abs(value - (10 * 9.0 + 140 * 0.2)) <= 0.01 * 152)
  }

  test("formatting is locale-independent") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val line = Bench.officialLine(Seq("q1" -> 1.5, "q2" -> 2.25), "/x")
      assert(!line.contains("1,5") && line.contains("2.25"),
        s"comma-decimal leak: $line")
    } finally java.util.Locale.setDefault(prev)
  }
}
