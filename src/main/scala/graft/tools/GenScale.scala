package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the scaling bench (SURVEY §7 round 6 /
  * verdict item 2): replicates the driver's sf0.1 tables N× into a
  * larger synthetic SF so the 100×-scale claims can be checked
  * empirically (per-query time vs SF must stay ~linear).
  *
  * Replication is NOT naive row duplication — each copy gets a
  * disjoint key space and decorrelated content so operator work
  * scales the way a real bigger corpus would:
  *
  *  - All entity keys (custkey, orderkey, suppkey, partkey, doc_id,
  *    vec_id, event_id, user_id) are offset per copy by the entity's
  *    key-space stride, so join fan-outs and group cardinalities
  *    scale linearly (orders-per-customer, lines-per-order, events-
  *    per-user stay constant).
  *  - `documents.text`: every whitespace token is suffixed with the
  *    copy tag (copy 0 keeps the original). Within-copy Jaccard /
  *    minhash / simhash relationships are preserved exactly; across
  *    copies word sets are disjoint, so near-dup cluster COUNT grows
  *    10× while cluster SIZE stays constant — without this, N
  *    verbatim copies of every doc would turn each cluster into a
  *    10×-bigger one and the pair-output ops would blow up
  *    quadratically on generator artifacts rather than data scale.
  *  - `embeddings.embedding`: each copy's vectors are cyclically
  *    rotated by the copy index (norm- and within-copy-geometry-
  *    preserving, decorrelates across copies) and `label` is remapped
  *    per copy — cell count ×N at constant cell size, which is
  *    exactly the k ∝ √N coarse-quantizer contract the Σ|cell|² ops
  *    (sim_knn_graph, graph_triangles, dedup_embed) document.
  *  - `events.ts` is passed through in whatever encoding the input
  *    uses (TIMESTAMP(µs) today; BIGINT nanos under the legacy conf
  *    for old TIMESTAMP(NANOS) inputs) — `Tables.events` normalizes
  *    all of them on read. The time RANGE is kept, so windowed
  *    aggregates see N× denser windows (more traffic over the same
  *    period), not a longer history.
  *  - `region`/`nation` stay fixed: they are bounded dimension tables
  *    at any SF (as in TPC-H).
  *  - Output files are BOUNDED in rows-per-file. The first sf10 run
  *    wrote `documents` as ONE file with ONE 500k-row row group —
  *    parquet splits at row-group granularity, so every per-document
  *    operator's scan (and its md5/minhash/shingle arithmetic, the
  *    expensive part) serialized into a single task on a 32-core box
  *    and read as a 30–80× "superlinear blowup" that was really the
  *    DATA's layout. A writer at 100 TB must bound file/row-group
  *    size for exactly this reason; the generator now repartitions
  *    each table to a per-table rows-per-file budget before writing.
  *
  * Usage: runMain graft.tools.GenScale <inSfDir> <outDir> [copies=10]
  */
object GenScale {

  def main(args: Array[String]): Unit = {
    val inDir = args(0)
    val outDir = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    try generate(spark, inDir, outDir, copies)
    finally spark.stop()
  }

  def generate(spark: SparkSession, inDir: String, outDir: String,
               copies: Int): Unit = {
    import spark.implicits._
    def in(name: String): DataFrame =
      spark.read.parquet(s"$inDir/$name.parquet")
    // rows-per-file budgets (≈4–32 MB files): scan parallelism of the
    // OUTPUT is files × row groups, so the write side must bound them
    val rowsPerFile = Map(
      "customer" -> 500000L, "supplier" -> 500000L, "part" -> 500000L,
      "orders" -> 500000L, "lineitem" -> 2000000L, "events" -> 400000L,
      "documents" -> 16000L, "embeddings" -> 8000L)
    def write(df: DataFrame, name: String, expectedRows: Long = 0L): Unit = {
      val sized = rowsPerFile.get(name)
        .filter(_ => expectedRows > 0)
        .map(rpf => df.repartition(
          math.max(1L, (expectedRows + rpf - 1) / rpf).toInt))
        .getOrElse(df)
      sized.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name.parquet")
    }
    // one stride per ENTITY, taken from its home table, so foreign
    // keys in fact tables shift consistently with their dimensions
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key)).cast("long")).head.getLong(0) + 1
    val custS = stride(in("customer"), "c_custkey")
    val suppS = stride(in("supplier"), "s_suppkey")
    val partS = stride(in("part"), "p_partkey")
    val ordS = stride(in("orders"), "o_orderkey")
    val docS = stride(in("documents"), "doc_id")
    val vecS = stride(in("embeddings"), "vec_id")

    // explode a copy index instead of unioning N plans: one scan of
    // the source, one write, no N-branch plan
    def fanOut(df: DataFrame): DataFrame =
      df.withColumn("copy",
        explode(expr(s"sequence(0L, ${copies - 1}L)")))
    def shifted(df: DataFrame, shifts: (String, Long)*): DataFrame =
      shifts.foldLeft(fanOut(df)) { case (d, (k, s)) =>
        d.withColumn(k, col(k) + $"copy" * s)
      }

    def cnt(name: String): Long = in(name).count()
    write(in("region"), "region")
    write(in("nation"), "nation")
    write(shifted(in("customer"), "c_custkey" -> custS).drop("copy"),
      "customer", cnt("customer") * copies)
    write(shifted(in("supplier"), "s_suppkey" -> suppS).drop("copy"),
      "supplier", cnt("supplier") * copies)
    write(shifted(in("part"), "p_partkey" -> partS).drop("copy"), "part",
      cnt("part") * copies)
    write(shifted(in("orders"),
        "o_orderkey" -> ordS, "o_custkey" -> custS).drop("copy"), "orders",
      cnt("orders") * copies)
    write(shifted(in("lineitem"), "l_orderkey" -> ordS,
        "l_partkey" -> partS, "l_suppkey" -> suppS).drop("copy"), "lineitem",
      cnt("lineitem") * copies)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = in("events") // ts passes through as-loaded; readers adapt
    val userS = stride(ev, "user_id")
    val evS = stride(ev, "event_id")
    write(shifted(ev, "event_id" -> evS, "user_id" -> userS)
      .drop("copy"), "events", ev.count() * copies)

    write(fanOut(in("documents"))
      .withColumn("doc_id", $"doc_id" + $"copy" * docS)
      .withColumn("text",
        // tokenize exactly like the dedup pipeline (split(trim, ' +'))
        // so irregular whitespace can't mint empty "~<copy>" tokens
        // that perturb copy-N word sets relative to copy 0
        when($"copy" === 0, $"text").otherwise(expr(
          "array_join(transform(" +
            "filter(split(trim(text), ' +'), w -> w != ''), " +
            "w -> concat(w, '~', copy)), ' ')")))
      .withColumn("n_chars", length($"text"))
      .drop("copy"), "documents", cnt("documents") * copies)

    // label stride derived like every other key (max+1), not a fixed
    // literal: labels >= the literal would collide across copies and
    // silently break the disjoint-cell invariant
    val labS = stride(in("embeddings"), "label")
    write(fanOut(in("embeddings"))
      .withColumn("vec_id", $"vec_id" + $"copy" * vecS)
      .withColumn("r", ($"copy" % 64).cast("int"))
      .withColumn("embedding", expr(
        "concat(slice(embedding, r + 1, 64 - r), slice(embedding, 1, r))"))
      .withColumn("label",
        ($"label" + $"copy" * labS).cast("int"))
      .drop("copy", "r"), "embeddings", cnt("embeddings") * copies)
  }
}
