package graft.streaming

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The shared sink primitives — here the size-tiered absorb POLICY
  * ([[Manifests.tierSources]]), which both sinks delegate to: steady
  * state absorbs the smallest ⌈max/2⌉ live generations; a sink
  * starting OVER the bound absorbs enough that one fold restores the
  * invariant. (The fold mechanics around the policy — manifests, GC,
  * sig twins — are pinned by DocStreamSpec/EventStreamSpec on the real
  * sinks.) */
class ManifestsSpec extends AnyFunSuite {

  /** gen=K directories holding one file of `bytes(K)` bytes each. */
  private def withGens[A](bytes: Map[Long, Int])(
      f: (org.apache.hadoop.fs.FileSystem, Seq[Path]) => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("tiers")
    try {
      bytes.foreach { case (k, n) =>
        val d = tmp.resolve(s"gen=$k")
        java.nio.file.Files.createDirectories(d)
        java.nio.file.Files.write(d.resolve("part"), new Array[Byte](n))
      }
      val base = new Path(tmp.toString)
      val fs = base.getFileSystem(new org.apache.hadoop.conf.Configuration())
      val gens = bytes.keys.toSeq.sorted.map(k => new Path(base, s"gen=$k"))
      f(fs, gens)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
  }

  test("under the bound nothing is absorbed") {
    withGens(Map(0L -> 10, 1L -> 20)) { (fs, gens) =>
      assert(Manifests.tierSources(fs, gens, maxGenerations = 3).isEmpty)
    }
  }

  test("steady state absorbs the smallest half, size then id order") {
    // live = max: publishing one more would exceed, absorb ⌈max/2⌉
    withGens(Map(0L -> 400, 1L -> 100, 2L -> 100, 3L -> 50)) { (fs, gens) =>
      val absorbed = Manifests.tierSources(fs, gens, maxGenerations = 4)
      // smallest by bytes first (gen=3 @50), then the id tiebreak
      // between the two 100-byte gens (gen=1 before gen=2)
      assert(absorbed.map(_._1.getName) === Seq("gen=3", "gen=1"))
      assert(absorbed.map(_._2) === Seq(50L, 100L))
    }
  }

  test("a sink far over the bound is restored by ONE fold") {
    // 10 live gens, maxGenerations = 4: k must be live+1-max = 7 so
    // that live − k + 1 = 4 ≤ max — not the steady-state ⌈max/2⌉ = 2
    val sizes = (0L until 10L).map(k => k -> (10 + k.toInt)).toMap
    withGens(sizes) { (fs, gens) =>
      val absorbed = Manifests.tierSources(fs, gens, maxGenerations = 4)
      assert(absorbed.size === 7)
      assert(gens.size - absorbed.size + 1 <= 4)
      // still smallest-first
      assert(absorbed.map(_._1.getName).toSet ===
        (0L until 7L).map(k => s"gen=$k").toSet)
    }
  }

  test("absorb count never exceeds the live set") {
    withGens(Map(0L -> 10, 1L -> 10)) { (fs, gens) =>
      assert(Manifests.tierSources(fs, gens, maxGenerations = 1)
        .size === 2)
    }
  }
}
