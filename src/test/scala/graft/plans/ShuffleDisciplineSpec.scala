package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** The tmpfs shuffle-scratch gate must demand evidence of RAM headroom,
  * not just tmpfs capacity (r15 advice: /dev/shm usable space measures the
  * mount, and spills land there too — choosing tmpfs on a RAM-tight box
  * ends in an OOM kill that skips the cleanup hook).
  */
class ShuffleDisciplineSpec extends AnyFunSuite {

  private def meminfoFile(content: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempFile("meminfo", ".txt")
    java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    p.toFile.deleteOnExit()
    p
  }

  test("memAvailableBytes parses the kernel line and scales kB to bytes") {
    val p = meminfoFile(
      "MemTotal:       131072000 kB\n" +
        "MemFree:         1234567 kB\n" +
        "MemAvailable:   98765432 kB\n" +
        "Buffers:          111111 kB\n")
    assert(ShuffleDiscipline.memAvailableBytes(p).contains(98765432L * 1024))
  }

  test("missing MemAvailable line or unreadable file fails CLOSED (None)") {
    val noLine = meminfoFile("MemTotal: 1 kB\nMemFree: 1 kB\n")
    assert(ShuffleDiscipline.memAvailableBytes(noLine).isEmpty)
    val gone = java.nio.file.Paths.get("/nonexistent/meminfo")
    assert(ShuffleDiscipline.memAvailableBytes(gone).isEmpty)
  }

  test("this Linux box reports a plausible MemAvailable") {
    // the real /proc/meminfo must parse (the gate depends on it here)
    val real = ShuffleDiscipline.memAvailableBytes()
    assert(real.exists(b => b > 0L && b < (1L << 50)), s"got $real")
  }
}
