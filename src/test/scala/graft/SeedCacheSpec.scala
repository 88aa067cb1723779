package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.core.SeedCache

/** The versioned seed-once cache behind the stored-index twins (r17
  * verdict item 2 + r18 advisor): code-fingerprinted keys make stale
  * replays across code versions structurally impossible, and the
  * atomic directory claim makes concurrent seeders safe.
  */
class SeedCacheSpec extends AnyFunSuite {

  test("fingerprint is stable, hex, and sensitive to the class list") {
    val fp = SeedCache.fingerprint
    assert(fp.matches("[0-9a-f]{16}"), fp)
    assert(SeedCache.fingerprint == fp) // lazy val, but also deterministic
    val a = SeedCache.fingerprintOf(classOf[String])
    val b = SeedCache.fingerprintOf(classOf[String], classOf[Integer])
    assert(a.matches("[0-9a-f]{16}") && a != b)
    // order-independent: the key must not depend on call-site ordering
    assert(SeedCache.fingerprintOf(classOf[Integer], classOf[String]) == b)
  }

  test("ensure seeds once per key and embeds the fingerprint in the path") {
    val key = s"spec-${System.nanoTime()}"
    var seeds = 0
    def seed(p: String): Unit = {
      seeds += 1
      Files.write(Paths.get(p, "artifact"), "v1".getBytes("UTF-8"))
    }
    val p1 = SeedCache.ensure("graft-seedcache-spec", key)(seed)
    val p2 = SeedCache.ensure("graft-seedcache-spec", key)(seed)
    assert(p1 == p2 && seeds == 1, s"seeded $seeds times")
    assert(p1.endsWith(s"${key}_${SeedCache.fingerprint}"),
      s"path $p1 does not embed the code fingerprint")
    assert(Files.exists(Paths.get(p1, "_SEEDED")) &&
           Files.exists(Paths.get(p1, "artifact")))
  }

  test("a stale artifact under a different fingerprint cannot gate: ensure reseeds fresh") {
    // simulate "the code changed": an old cache dir exists under the
    // same corpus key but a different (old-code) fingerprint, with a
    // complete-looking marker. ensure() must ignore it entirely.
    val key = s"stale-${System.nanoTime()}"
    val staleFp = "0" * 16
    assert(staleFp != SeedCache.fingerprint)
    val stale = Paths.get(sys.props("java.io.tmpdir"),
      "graft-seedcache-spec", s"${key}_$staleFp")
    Files.createDirectories(stale)
    Files.write(stale.resolve("artifact"), "STALE".getBytes("UTF-8"))
    Files.createFile(stale.resolve("_SEEDED"))
    var seeds = 0
    val p = SeedCache.ensure("graft-seedcache-spec", key) { tmp =>
      seeds += 1
      Files.write(Paths.get(tmp, "artifact"), "FRESH".getBytes("UTF-8"))
    }
    assert(p != stale.toString && seeds == 1,
      "ensure replayed a stale artifact from a different code version")
    assert(new String(Files.readAllBytes(Paths.get(p, "artifact")),
      "UTF-8") == "FRESH")
  }

  test("concurrent ensure calls never corrupt the artifact (atomic claim, 16 threads)") {
    val key = s"race-${System.nanoTime()}"
    val seeds = new java.util.concurrent.atomic.AtomicInteger
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    try {
      val barrier = new java.util.concurrent.CyclicBarrier(16)
      val futures = (0 until 16).map { i =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = {
            barrier.await()
            SeedCache.ensure("graft-seedcache-spec", key) { tmp =>
              seeds.incrementAndGet()
              // multi-file artifact with a PER-SEEDER token: an
              // interleaved (corrupted) write would mix tokens and
              // break the pair equality below
              Files.write(Paths.get(tmp, "a"), s"seeder-$i".getBytes("UTF-8"))
              Files.write(Paths.get(tmp, "b"), s"seeder-$i".getBytes("UTF-8"))
            }
          }
        })
      }
      val paths = futures.map(_.get()).toSet
      assert(paths.size == 1, s"racers resolved different paths: $paths")
      val p = paths.head
      assert(Files.exists(Paths.get(p, "_SEEDED")))
      // whole-directory atomic move: the artifact is ONE seeder's
      // complete output, never an interleaving
      val a = new String(Files.readAllBytes(Paths.get(p, "a")), "UTF-8")
      val b = new String(Files.readAllBytes(Paths.get(p, "b")), "UTF-8")
      assert(a == b, s"artifact interleaved two seeders: a=$a b=$b")
      assert(seeds.get() >= 1)
      // losers cleaned their temp siblings
      import scala.jdk.CollectionConverters._
      val leftovers = Files.list(Paths.get(p).getParent).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith(s"${key}_") && n.contains(".seeding-"))
        .toSeq
      assert(leftovers.isEmpty, s"leaked temp dirs: $leftovers")
    } finally pool.shutdown()
  }
}
