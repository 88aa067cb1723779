package graft.core

/** Seed-once artifact cache for the stored-index twins
  * (`sim_*_stored`, `dedup_incremental_stored`): a directory under
  * the JVM temp dir holding a seeded index, keyed by corpus identity
  * AND a CODE FINGERPRINT, claimed atomically.
  *
  * Two failure modes of the pre-r18 ad-hoc caches are closed here:
  *
  *  1. '''Stale replay across code versions''' (r17 verdict item 2):
  *     the old key was (corpus path, row count) only, so changing any
  *     band/signature/codebook/graph code silently replayed a stale
  *     artifact — the stored twin then failed the oracle while its
  *     recompute twin passed. The cache path now embeds
  *     [[fingerprint]], an MD5 over the BYTECODE of every class on
  *     the seed/encode path: any code change to those classes moves
  *     the cache to a fresh path and reseeds. Over-invalidation (an
  *     unrelated edit in the same class) costs one reseed, never a
  *     wrong answer.
  *  2. '''Concurrent-seeder corruption''' (r18 advisor): two JVMs
  *     (e.g. Verify and Bench on the same SF) could both observe a
  *     missing marker and seed into the SAME path with static
  *     overwrite, corrupting the parquet index. Seeding now writes to
  *     a per-process temp sibling and lands via ATOMIC_MOVE of the
  *     whole directory — the marker is inside the moved directory, so
  *     a visible marker implies a complete artifact; the rename loser
  *     discards its own copy and reads the winner's.
  *
  * A seeder that crashes mid-write leaves only its `.seeding-*` temp
  * sibling (bounded garbage in the temp dir, never a live artifact);
  * the claimed path either does not exist or is complete.
  *
  * The production twin of this helper is a scheduled build job
  * writing to a durable store path — the cache exists so local runs
  * and benches pay the build once per (corpus, code version).
  */
object SeedCache {

  /** MD5 (16 hex chars) over the bytecode of the classes behind every
    * seed/encode path that feeds a cached artifact. One repo-wide
    * fingerprint on purpose: precision per artifact family would save
    * only an occasional cross-family reseed, while a missed
    * dependency would resurrect the stale-replay bug. The class list
    * covers the orchestrators (Dedup, DedupIngest, AnnIndex,
    * Similarity) and the native expressions their signatures derive
    * from; lambdas and nested methods compile into these classfiles,
    * so any edit moves the hash.
    */
  lazy val fingerprint: String = fingerprintOf(
    Class.forName("graft.dedup.Dedup$"),
    Class.forName("graft.streaming.DedupIngest$"),
    Class.forName("graft.similarity.AnnIndex$"),
    Class.forName("graft.similarity.Similarity$"),
    Class.forName("org.apache.spark.sql.graft.Md5Lower64"),
    Class.forName("org.apache.spark.sql.graft.MinHashSigMd5"),
    Class.forName("org.apache.spark.sql.graft.MinHashBands"),
    Class.forName("org.apache.spark.sql.graft.CosineSimilarity"))

  /** MD5 over the given classes' classfile bytes, sorted by name so
    * the result is list-order-independent. Fails loudly if a
    * classfile resource is missing (it never is under sbt/spark
    * classpaths; a packaging that strips classes would silently
    * disable versioning otherwise).
    */
  private[graft] def fingerprintOf(classes: Class[_]*): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    classes.sortBy(_.getName).foreach { c =>
      val res = "/" + c.getName.replace('.', '/') + ".class"
      val in = c.getResourceAsStream(res)
      require(in != null, s"no classfile resource for ${c.getName}")
      try {
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { md.update(buf, 0, n); n = in.read(buf) }
      } finally in.close()
    }
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  /** Ensure `<tmpdir>/<cacheDir>/<key>_<fingerprint>` holds a seeded
    * artifact and return that path. `seedFn` receives a TEMP path to
    * write the whole artifact under; the directory is moved into
    * place atomically afterwards. Safe under concurrent callers in
    * the same or different JVMs (see class doc).
    */
  def ensure(cacheDir: String, key: String)(seedFn: String => Unit): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val path = s"${sys.props("java.io.tmpdir")}/$cacheDir/${key}_$fingerprint"
    val marker = Paths.get(path, "_SEEDED")
    if (!Files.exists(marker)) {
      val tmp = s"$path.seeding-${ProcessHandle.current().pid}-${System.nanoTime()}"
      Files.createDirectories(Paths.get(tmp))
      seedFn(tmp)
      Files.createFile(Paths.get(tmp, "_SEEDED"))
      try Files.move(Paths.get(tmp), Paths.get(path),
        StandardCopyOption.ATOMIC_MOVE)
      catch {
        case e: java.nio.file.FileSystemException =>
          // rename onto an existing artifact: we lost the seed race.
          // A visible marker proves the winner's directory is
          // complete (it moved in atomically, marker inside) — drop
          // our copy and use it. No marker means something else owns
          // the path: rethrow rather than guess.
          if (!Files.exists(marker)) throw e
          rmTree(Paths.get(tmp))
      }
    }
    path
  }

  private def rmTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(p)
      try walk.iterator().asScala.toVector
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.delete)
      finally walk.close()
    }
}
