package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, Generator, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector/hash hot paths. The
  * higher-order-function versions of these are interpreted lambda
  * trees (~µs per element); these run as tight JVM loops — the
  * simhash pass dropped from ~50 s to sub-second at sf0.1.
  */

/** Cosine similarity over two `array<double>` columns, with the same
  * left-to-right accumulation order as a scalar loop (bit-identical
  * to the DuckDB oracle's `list_cosine_similarity` on doubles).
  * Full whole-stage-codegen support via [[doGenCode]].
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  // default ExpectsInputTypes validation applies: SQL calls over
  // non-double arrays fail analysis instead of misreading the buffer
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** 64-bit SimHash from an `array<long>` of per-token hashes: each
  * hash votes ±1 on every bit; positive tallies set the bit.
  * Semantics identical to the HOF formulation it replaced.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var k = 0
    while (k < arr.numElements()) {
      val h = arr.getLong(k)
      var i = 0
      while (i < 64) {
        if (((h >> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      k += 1
    }
    var r = 0L; var i = 0
    while (i < 64) { if (counts(i) > 0) r |= (1L << i); i += 1 }
    r
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Random-hyperplane LSH bucket ids for an `array<double>` vector:
  * `tables` independent tables of `bits` hyperplanes each. Plane
  * component (t, j, i) derives from md5 of the literal string
  * "hp:t:j:i" — top 53 bits of the lower digest half mapped to
  * [-1, 1) as (h >>> 11) / 2⁵² − 1, every step exactly representable
  * in a double — so an external SQL oracle reproduces the planes,
  * the dot products (sequential accumulation both sides), and hence
  * the buckets bit-for-bit. (Uniform cube directions instead of
  * Gaussian: sign-test LSH only needs symmetric directions, and the
  * recall spec guards the quality.) Deterministic on every executor,
  * no stored model. Returns `array<long>` of length `tables`.
  */
case class HyperplaneBuckets(child: Expression, tables: Int, bits: Int, dims: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  @transient private lazy val planes: Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(tables * bits) { tj =>
      val t = tj / bits; val j = tj % bits
      Array.tabulate(dims) { i =>
        md.reset()
        val d = md.digest(s"hp:$t:$j:$i".getBytes("UTF-8"))
        var h = 0L; var b = 15
        while (b >= 8) { h = (h << 8) | (d(b) & 0xffL); b -= 1 }
        (h >>> 11).toDouble / 4503599627370496.0 - 1.0
      }
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dims, v.numElements())
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L; var j = 0
      while (j < bits) {
        val p = planes(t * bits + j)
        var dot = 0.0; var i = 0
        while (i < n) { dot += p(i) * v.getDouble(i); i += 1 }
        if (dot > 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket; t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash LSH band hashes for an `array<string>` token set, in one
  * tight pass: each token is xxhash64'd twice (seeds 42/1), slot i's
  * hash is h1 XOR rotl(h2, i), and each band of `rowsPerBand`
  * consecutive slot-minima folds into one hash via chained hashLong.
  * Returns `array<long>` of length `numBands`.
  *
  * Rotate-xor, NOT the linear h1 + i·h2 family: under the linear
  * schedule a token with small h1 AND small h2 stays the argmin
  * across most slots, so a single such token in a pair's symmetric
  * difference breaks nearly every band at once (measured 12× the
  * expected LSH miss rate). Rotation relocates h2's bits every slot,
  * decorrelating argmins. The family's period is 64, so the
  * constructor REQUIRES numBands·rowsPerBand ≤ 64 — more slots would
  * silently reuse identical hash functions and correlate signatures.
  * Replaces an interpreted HOF pipeline that cost ~30 s per
  * evaluation at sf0.1 — cheap enough to recompute across iterative
  * joins instead of caching.
  */
case class MinHashBands(child: Expression, numBands: Int, rowsPerBand: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(numBands >= 1 && rowsPerBand >= 1 && numBands * rowsPerBand <= 64,
    s"rotate-xor family has period 64: numBands*rowsPerBand must be <= 64, " +
      s"got $numBands*$rowsPerBand")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val slots = numBands * rowsPerBand
    val sig = Array.fill(slots)(Long.MaxValue)
    var k = 0
    while (k < arr.numElements()) {
      val w = arr.getUTF8String(k)
      val h1 = XxHash64Function.hash(w, StringType, 42L)
      val h2 = XxHash64Function.hash(w, StringType, 1L)
      var i = 0
      while (i < slots) {
        val c = h1 ^ java.lang.Long.rotateLeft(h2, i)
        if (c < sig(i)) sig(i) = c
        i += 1
      }
      k += 1
    }
    val bands = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var h = 17L; var r = 0
      while (r < rowsPerBand) {
        h = XxHash64Function.hash(sig(b * rowsPerBand + r), LongType, h)
        r += 1
      }
      bands(b) = h; b += 1
    }
    new GenericArrayData(bands)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Lower 64 bits of the MD5 digest of a string, read little-endian
  * from digest bytes 8..16 — the exact bit pattern DuckDB's
  * `md5_number_lower` returns (as UBIGINT; here reinterpreted as the
  * signed long with the same bits). Gives dedup/fingerprint pipelines
  * a 64-bit word hash that an external SQL oracle can reproduce,
  * which xxhash64 (Spark-only) cannot.
  */
object Md5Lower64 {
  // MessageDigest is not thread-safe and getInstance per row allocates;
  // one digest per executor thread, reset between rows (shared with
  // MinHashSigMd5, which needs both digest halves from one pass)
  private[graft] val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
}

case class Md5Lower64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val md = Md5Lower64.digests.get()
    md.reset()
    val d = md.digest(bytes)
    var r = 0L; var i = 15
    while (i >= 8) { r = (r << 8) | (d(i) & 0xffL); i -= 1 }
    r
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Sum of Unicode code points of a string — a deterministic scalar
  * both Spark and an external oracle can compute over text chunks
  * (DuckDB: `list_sum(list_transform(range(1, length(s)+1),
  * j -> ord(substr(s, j, 1))))`). Used as the multimodal decode
  * stub's "frame feature" so the envelope hash-verifies.
  */
case class CodepointSum(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    var r = 0L; var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      r += cp; i += Character.charCount(cp)
    }
    r
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 63-bit md5 hashes of every word n-gram shingle in ONE pass — the
  * fused form of `transform(sequence(0, greatest(size(words)-n, 0)),
  * i -> graft_md5lower64(concat_ws(' ', slice(words, i+1, n))) &
  * 9223372036854775807)`, which paid an interpreted lambda dispatch,
  * a slice-array copy, AND a concat_ws string materialization per
  * shingle per row (the hot scan of txt_dup_coverage /
  * txt_contamination / txt_fingerprint). Word bytes are extracted
  * once; each shingle streams its words (0x20-separated) through the
  * thread-local digest — same bytes, same lower-64 little-endian
  * mapping, same 63-bit mask, so output is bit-identical and the
  * DuckDB oracles replay unchanged. A shorter-than-n document yields
  * its single whole-document shingle, exactly like the slice form.
  */
case class ShingleMd5(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(n >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val size = arr.numElements()
    val words = new Array[Array[Byte]](size)
    var i = 0
    while (i < size) {
      // concat_ws SKIPS null elements (no separator either) — match
      // it, or a null-bearing array NPEs where the pipeline hashed
      val u = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      words(i) = if (u == null) null else u.getBytes
      i += 1
    }
    val m = math.max(size - n, 0) + 1
    val md = Md5Lower64.digests.get()
    val out = new Array[Long](m)
    val sep = Array[Byte](0x20)
    i = 0
    while (i < m) {
      md.reset()
      val end = math.min(i + n, size)
      var j = i
      var first = true
      while (j < end) {
        if (words(j) != null) {
          if (!first) md.update(sep)
          md.update(words(j))
          first = false
        }
        j += 1
      }
      val d = md.digest()
      var r = 0L
      var k = 15
      while (k >= 8) { r = (r << 8) | (d(k) & 0xffL); k -= 1 }
      out(i) = r & Long.MaxValue
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** The full 63-segment perceptual hash of a string in ONE pass — the
  * fused form of [[graft.multimodal.Multimodal.mmPerceptualHash]]'s
  * `transform(sequence(0,62), i -> codepoint_sum(substring(...)))`
  * pipeline, which paid an INTERPRETED lambda dispatch plus a
  * substring materialization per segment per row (63 partial string
  * copies each scanned once more for its code-point sum). Here the
  * string is walked once: code points accumulate into their segment's
  * slot (segment boundaries ⌊i·len/63⌋ in CODE POINTS, matching
  * Spark `substring`/`length` semantics), then bit i is set when
  * segment i's sum·len exceeds total·width_i — cross-multiplied
  * integers, bit-identical to the expression pipeline and to the
  * DuckDB oracle's substr/ord replay (spec-asserted equal on the
  * corpus plus unicode edge cases).
  */
case class Phash63(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    var n = 0L
    var i = 0
    while (i < s.length) {
      n += 1; i += Character.charCount(s.codePointAt(i))
    }
    if (n == 0L) return 0L
    val sums = new Array[Long](63)
    i = 0
    var p = 0L
    var seg = 0
    while (i < s.length) {
      while (seg < 62 && p >= (seg + 1) * n / 63) seg += 1
      val cp = s.codePointAt(i)
      sums(seg) += cp
      i += Character.charCount(cp); p += 1
    }
    var total = 0L
    var k = 0
    while (k < 63) { total += sums(k); k += 1 }
    var phash = 0L
    k = 0
    while (k < 63) {
      val w = (k + 1) * n / 63 - k * n / 63
      if (sums(k) * n > total * w) phash |= 1L << k
      k += 1
    }
    phash
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash straight from an `array<string>` token set: md5
  * digest (lower 64 bits little-endian — DuckDB's `md5_number_lower`)
  * and the ±1 bit votes fused in one tight loop. Replaces the
  * `transform(wset, w -> graft_md5lower64(w))` + [[SimHash64]] pair:
  * a lambda inside `transform` is INTERPRETED per element, so the
  * per-word hashing paid lambda dispatch on every token even though
  * the hash itself was native. Output is bit-identical to the
  * two-step formulation (same digest, same votes), so the SQL oracle
  * replays it unchanged.
  */
case class SimHash64Md5(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val md = Md5Lower64.digests.get()
    var k = 0
    while (k < arr.numElements()) {
      md.reset()
      val d = md.digest(arr.getUTF8String(k).getBytes)
      var h = 0L; var b = 15
      while (b >= 8) { h = (h << 8) | (d(b) & 0xffL); b -= 1 }
      var i = 0
      while (i < 64) {
        if (((h >> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      k += 1
    }
    var r = 0L; var i = 0
    while (i < 64) { if (counts(i) > 0) r |= (1L << i); i += 1 }
    r
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature (slot minima) for an `array<string>` token set,
  * built from ORACLE-REPLAYABLE base hashes: each token is md5-digested
  * once, h1/h2 = the lower/upper 64 digest bits little-endian (the
  * exact values DuckDB's `md5_number_lower`/`md5_number_upper` return),
  * and slot i's hash is (h1 XOR rotl(h2, i)) masked to 63 bits, with
  * the mask making signed and unsigned minima agree. The rotation is
  * SQL-replayable as (h2·2ⁱ mod 2⁶⁴) + (h2 >> (64−i)), which stays
  * inside INT128 — unlike a 64×64 multiply-mix, whose product
  * overflows HUGEINT. Rotate-xor beats the linear Kirsch–Mitzenmacher
  * family here: under h1 + i·h2 a word with small h1 AND small h2
  * stays the argmin across most slots, so one such word in a pair's
  * symmetric difference breaks nearly every band (measured: 72/516
  * j ≥ 0.9 pairs missed vs ~6 expected); rotation relocates h2's bits
  * each slot, so argmins decorrelate. The family's period is 64,
  * hence the `slots <= 64` requirement — more slots would silently
  * reuse hash functions.
  * Returns `array<long>` of `slots` minima; banding happens outside in
  * plain SQL (md5 of the joined band slice) so the whole
  * signature → band → bucket pipeline is DuckDB-expressible.
  */
case class MinHashSigMd5(child: Expression, slots: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(slots >= 1 && slots <= 64,
    s"rotate-xor family has period 64: slots must be in [1, 64], got $slots")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(slots)(Long.MaxValue)
    val md = Md5Lower64.digests.get()
    var k = 0
    while (k < arr.numElements()) {
      md.reset()
      val d = md.digest(arr.getUTF8String(k).getBytes)
      var h1 = 0L; var h2 = 0L; var i = 15
      while (i >= 8) { h1 = (h1 << 8) | (d(i) & 0xffL); i -= 1 }
      i = 7
      while (i >= 0) { h2 = (h2 << 8) | (d(i) & 0xffL); i -= 1 }
      var s = 0
      while (s < slots) {
        val c = (h1 ^ java.lang.Long.rotateLeft(h2, s)) & Long.MaxValue
        if (c < sig(s)) sig(s) = c
        s += 1
      }
      k += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Pack a set of bit positions (`array<int>`, each in [0, 64·width))
  * into a fixed-width `array<long>` bitmask — the word-set encoding of
  * the small-vocabulary dedup path, built once per document.
  */
case class BitsToMask(child: Expression, width: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(width >= 1 && width <= 64, s"mask width out of range: $width")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))

  override def nullSafeEval(v: Any): Any = {
    val bits = v.asInstanceOf[ArrayData]
    val words = new Array[Long](width)
    var i = 0
    while (i < bits.numElements()) {
      val b = bits.getInt(i)
      words(b >>> 6) |= (1L << (b & 63))
      i += 1
    }
    new GenericArrayData(words)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Jaccard similarity of two equal-width `array<long>` bitmasks:
  * Σ popcount(a&b) / Σ popcount(a|b), accumulated in a tight primitive
  * loop. The int→double division matches [[SortedJaccard]] exactly, so
  * the two verify paths are bit-identical on the same sets. Runs
  * inline in the candidate join (~100 ALU ops/pair at width 64) where
  * the merge-scan path would need two corpus rejoins to fetch the
  * string arrays.
  */
case class MaskJaccard(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var inter = 0; var union = 0
    while (i < n) {
      val xa = x.getLong(i); val ya = y.getLong(i)
      inter += java.lang.Long.bitCount(xa & ya)
      union += java.lang.Long.bitCount(xa | ya)
      i += 1
    }
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Jaccard similarity of two pre-sorted, deduplicated `array<string>`
  * columns via a merge scan — O(|a|+|b|) comparisons, no per-row hash
  * set allocation (array_intersect builds one per invocation, which
  * dominated the blocked near-dup join).
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter.toDouble / (nx + ny - inter)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Per-cell kNN generator: input is one COARSE-QUANTIZER CELL packed
  * as `array<struct<id: long, v: array<double>>>`; output is each
  * member's top-k cosine neighbors within the cell (score DESC, id
  * ASC ties), one row per (vector, rank).
  *
  * This is the shuffle-shape fix for whole-corpus kNN-graph
  * construction: the join formulation materializes Σ|cell|² PAIR
  * rows, each carrying two full vectors (~1 KB/row — the dominant
  * cost, measured), through an exchange before any arithmetic runs.
  * Packing each cell once (a single corpus-sized shuffle in the
  * groupBy) and generating neighbors from the packed row keeps the
  * quadratic part pure in-memory arithmetic: vectors are unpacked to
  * primitive arrays once per cell, norms precomputed, and the scoring
  * loop allocates nothing but the k-slot scratch. Cosine accumulation
  * is left-to-right per dimension — bit-identical to
  * [[CosineSimilarity]], so results match the join path and the
  * external oracle exactly.
  */
case class CellTopK(child: Expression, k: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(k >= 1, s"k must be positive, got $k")

  override def elementSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("neighbor_id", LongType, nullable = false),
    StructField("rank", IntegerType, nullable = false),
    StructField("cosine", DoubleType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _) if s.length == 2 &&
          s(0).dataType == LongType &&
          s(1).dataType.isInstanceOf[ArrayType] &&
          s(1).dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cell_topk needs array<struct<long, array<double>>>, got $other")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val cell = child.eval(input).asInstanceOf[ArrayData]
    if (cell == null) return Nil
    val n = cell.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = cell.getStruct(i, 2)
      ids(i) = row.getLong(0)
      val v = row.getArray(1).toDoubleArray()
      vecs(i) = v
      var s = 0.0; var d = 0
      while (d < v.length) { s += v(d) * v(d); d += 1 }
      norms(i) = math.sqrt(s)
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](n * math.min(k, math.max(n - 1, 0)))
    val bestId = new Array[Long](k)
    val bestCos = new Array[Double](k)
    i = 0
    while (i < n) {
      var m = 0
      val vi = vecs(i); val ni = norms(i)
      var j = 0
      while (j < n) {
        if (j != i) {
          val vj = vecs(j)
          val len = math.min(vi.length, vj.length)
          var dot = 0.0; var d = 0
          while (d < len) { dot += vi(d) * vj(d); d += 1 }
          val cos = dot / (ni * norms(j))
          val id = ids(j)
          // insertion into the k-slot scratch: score DESC, id ASC
          if (m < k || cos > bestCos(m - 1) ||
              (cos == bestCos(m - 1) && id < bestId(m - 1))) {
            var p = if (m < k) m else k - 1
            while (p > 0 && (cos > bestCos(p - 1) ||
                (cos == bestCos(p - 1) && id < bestId(p - 1)))) {
              bestCos(p) = bestCos(p - 1); bestId(p) = bestId(p - 1); p -= 1
            }
            bestCos(p) = cos; bestId(p) = id
            if (m < k) m += 1
          }
        }
        j += 1
      }
      var r = 0
      while (r < m) {
        out += InternalRow(ids(i), bestId(r), r + 1, bestCos(r))
        r += 1
      }
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "graft_cell_topk"
}

/** Threshold twin of [[CellTopK]]: emits every within-cell pair with
  * cosine ≥ `minCos` as (vec_id_1 < vec_id_2, cosine) — the packed
  * form of the label-blocked near-dup pair join ([[CellTopK]]'s
  * Scaladoc has the shuffle-shape rationale; here the win is larger
  * still because the qualifying pair set is SPARSE, so the join
  * formulation shipped Σ|cell|² vector-payload rows to discard
  * nearly all of them). Callers pass minCos slightly BELOW their
  * rounded threshold (τ − 1e-4 covers round-half-up at 4 decimals)
  * and re-apply the exact rounded predicate outside, so boundary
  * semantics stay bit-identical to the join path and the oracle.
  */
case class CellSimPairs(child: Expression, minCos: Double)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("vec_id_1", LongType, nullable = false),
    StructField("vec_id_2", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _) if s.length == 2 &&
          s(0).dataType == LongType &&
          s(1).dataType.isInstanceOf[ArrayType] &&
          s(1).dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cell_sim_pairs needs array<struct<long, array<double>>>, got $other")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val cell = child.eval(input).asInstanceOf[ArrayData]
    if (cell == null) return Nil
    val n = cell.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = cell.getStruct(i, 2)
      ids(i) = row.getLong(0)
      val v = row.getArray(1).toDoubleArray()
      vecs(i) = v
      var s = 0.0; var d = 0
      while (d < v.length) { s += v(d) * v(d); d += 1 }
      norms(i) = math.sqrt(s)
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    i = 0
    while (i < n) {
      val vi = vecs(i); val ni = norms(i)
      var j = i + 1
      while (j < n) {
        val vj = vecs(j)
        val len = math.min(vi.length, vj.length)
        var dot = 0.0; var d = 0
        while (d < len) { dot += vi(d) * vj(d); d += 1 }
        val cos = dot / (ni * norms(j))
        if (cos >= minCos) {
          val a = math.min(ids(i), ids(j))
          val b = math.max(ids(i), ids(j))
          out += InternalRow(a, b, cos)
        }
        j += 1
      }
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "graft_cell_sim_pairs"
}

/** Fused NSW base-graph generator (r19): [[CellTopK]]'s top-k cosine
  * edges UNIONED with the deterministic hash-ring edges (each member
  * links to its next 2 successors in (h, id) order within the cell),
  * deduplicated per member — the packed one-pass form of
  * `cellTopK ∪ ringEdges ∪ distinct`, which previously cost a second
  * corpus scan + window exchange for the ring and a third exchange
  * for the union's distinct. Input is one cell packed as
  * `array<struct<id: long, v: array<double>, h: long>>`; output rows
  * are (vec_id, neighbor_id). The top-k scoring loop is bit-identical
  * to [[CellTopK]] (same insertion order, same tie rule), and the
  * ring order (h asc, id asc) matches the window formulation, so the
  * emitted edge SET is exactly the old relation's.
  */
case class CellKnnRing(child: Expression, k: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(k >= 1, s"k must be positive, got $k")

  override def elementSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("neighbor_id", LongType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _) if s.length == 3 &&
          s(0).dataType == LongType &&
          s(1).dataType.isInstanceOf[ArrayType] &&
          s(1).dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
          s(2).dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cell_knn_ring needs array<struct<long, array<double>, long>>, got $other")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val cell = child.eval(input).asInstanceOf[ArrayData]
    if (cell == null) return Nil
    val n = cell.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    val norms = new Array[Double](n)
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = cell.getStruct(i, 3)
      ids(i) = row.getLong(0)
      val v = row.getArray(1).toDoubleArray()
      vecs(i) = v
      var s = 0.0; var d = 0
      while (d < v.length) { s += v(d) * v(d); d += 1 }
      norms(i) = math.sqrt(s)
      hs(i) = row.getLong(2)
      i += 1
    }
    // ring positions: member indices in (h, id) ascending order
    val order = Array.range(0, n).sortWith { (x, y) =>
      hs(x) < hs(y) || (hs(x) == hs(y) && ids(x) < ids(y))
    }
    val ringPos = new Array[Int](n) // member index -> sorted position
    i = 0
    while (i < n) { ringPos(order(i)) = i; i += 1 }
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](n * (k + 2))
    val bestId = new Array[Long](k)
    val bestCos = new Array[Double](k)
    val nbr = new Array[Long](k + 2) // per-member dedup scratch
    i = 0
    while (i < n) {
      var m = 0
      val vi = vecs(i); val ni = norms(i)
      var j = 0
      while (j < n) {
        if (j != i) {
          val vj = vecs(j)
          val len = math.min(vi.length, vj.length)
          var dot = 0.0; var d = 0
          while (d < len) { dot += vi(d) * vj(d); d += 1 }
          val cos = dot / (ni * norms(j))
          val id = ids(j)
          // insertion into the k-slot scratch: score DESC, id ASC
          if (m < k || cos > bestCos(m - 1) ||
              (cos == bestCos(m - 1) && id < bestId(m - 1))) {
            var p = if (m < k) m else k - 1
            while (p > 0 && (cos > bestCos(p - 1) ||
                (cos == bestCos(p - 1) && id < bestId(p - 1)))) {
              bestCos(p) = bestCos(p - 1); bestId(p) = bestId(p - 1); p -= 1
            }
            bestCos(p) = cos; bestId(p) = id
            if (m < k) m += 1
          }
        }
        j += 1
      }
      var nn = 0
      var r = 0
      while (r < m) { nbr(nn) = bestId(r); nn += 1; r += 1 }
      // ring successors of this member's sorted position, deduped
      // against the top-k ids (≤ k+2 neighbors — linear check)
      val pos = ringPos(i)
      var s = 1
      while (s <= 2) {
        if (pos + s < n) {
          val id = ids(order(pos + s))
          var seen = false
          var q = 0
          while (q < nn) { if (nbr(q) == id) seen = true; q += 1 }
          if (!seen) { nbr(nn) = id; nn += 1 }
        }
        s += 1
      }
      r = 0
      while (r < nn) { out += InternalRow(ids(i), nbr(r)); r += 1 }
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "graft_cell_knn_ring"
}

/** Bloom-filter membership probe over a pre-built sketch: `sketch` is
  * a BinaryType literal holding a serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] (built driver-side
  * from the SMALL side of a semi-join via `df.stat.bloomFilter`) and
  * `value` is the LongType probe key. This is the runtime-filter /
  * semi-join-reduction primitive: a few-MB sketch rides the closure
  * to every executor and prunes the BIG side at scan time, before
  * any shuffle — the pattern Spark's own `InjectRuntimeFilter` uses
  * for shuffle joins, made explicit so it composes with arbitrary
  * downstream plans. No false negatives, so exact operators built on
  * it (prune → exact join) stay exact.
  *
  * The sketch deserializes once per executor (transient lazy), and
  * codegen binds it as a referenced object — the probe itself is one
  * `mightContainLong` call inside whole-stage codegen.
  */
case class BloomMightContain(sketch: Expression, value: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  require(sketch.foldable, "bloom sketch must be a literal")
  override def left: Expression = sketch
  override def right: Expression = value
  override def dataType: DataType = BooleanType
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType)

  @transient private lazy val filter: org.apache.spark.util.sketch.BloomFilter = {
    val bytes = sketch.eval(null).asInstanceOf[Array[Byte]]
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(b: Any, v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // only the probe side generates code; the sketch is bound as a
    // reference object so the serialized bytes never enter the
    // generated source
    val f = ctx.addReferenceObj("graftBloom", filter,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    val vc = value.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code = code"""
      ${vc.code}
      boolean ${ev.isNull} = ${vc.isNull};
      boolean ${ev.value} = false;
      if (!${ev.isNull}) { ${ev.value} = $f.mightContainLong(${vc.value}); }""")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(sketch = l, value = r)
  override def prettyName: String = "graft_bloom_might_contain"
}

/** Nearest-centroid assignment for integer-quantized k-means (the
  * Lloyd iteration's map step): squared-L2 distance of an
  * `array<long>` vector against a FIXED centroid table carried in
  * the expression itself (k·dims longs — model state, not data),
  * returning `struct<cluster int, dist long>` for the strictly
  * nearest centroid, ties to the lowest centroid id.
  *
  * A tight two-level JVM loop per row — the HOF formulation would
  * interpret k·dims lambda calls per vector. All arithmetic is
  * exact int64 (components ≤ ~1e6 ⇒ squared sums ≤ ~2.6e14), so an
  * external SQL engine replays every distance and tie bit-for-bit.
  */
case class NearestCentroidL2(child: Expression, centroids: Seq[Seq[Long]])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("dist", LongType, nullable = false)))
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  @transient private lazy val cents: Array[Array[Long]] =
    centroids.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val vec = new Array[Long](n)
    var i = 0
    while (i < n) { vec(i) = v.getLong(i); i += 1 }
    var best = -1; var bestD = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val m = math.min(n, cv.length)
      var d = 0L; var j = 0
      while (j < m) { val t = vec(j) - cv(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    InternalRow(best, bestD)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "graft_nearest_centroid"
}

/** Count of code points OUTSIDE `[a-z0-9 ]` in ONE byte scan — the
  * fused form of `regexp_count(text, '[^a-z0-9 ]')`, whose
  * java.util.regex matcher steps `Matcher.find()` once PER CHARACTER
  * of punctuation (the hot 29 s of txt_quality's sf10 scan; this
  * expression retires it to the cost of the scan itself). UTF-8
  * walk: every non-continuation byte starts a code point; a
  * single-byte char is tested against the ASCII class, and any
  * multi-byte lead counts (no non-ASCII code point is in the class) —
  * code-point semantics identical to the regex, so the DuckDB
  * `regexp_extract_all` oracle replays unchanged.
  */
case class PunctCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    var r = 0L; var i = 0
    while (i < b.length) {
      val c = b(i)
      if ((c & 0xc0) != 0x80) {
        val in = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' '
        if (!in) r += 1
      }
      i += 1
    }
    r
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "graft_punct_count"
}

/** BPE-ish pre-tokenizer token count in ONE byte scan — the fused
  * form of `regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')`: one
  * token per maximal lowercase-letter run, per maximal digit run,
  * and per other non-space code point (spaces match no branch).
  * Maximal-munch run counting = "count code points whose class
  * differs from the previous code point's" for the run classes,
  * plus every `other` code point — bit-identical to the regex and
  * its DuckDB `regexp_extract_all` oracle.
  */
case class BpeCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    var r = 0L; var i = 0
    // 0 = letter run, 1 = digit run, 2 = space, 3 = other, 4 = start
    var prev = 4
    while (i < b.length) {
      val c = b(i)
      if ((c & 0xc0) != 0x80) {
        val cls =
          if (c >= 'a' && c <= 'z') 0
          else if (c >= '0' && c <= '9') 1
          else if (c == ' ') 2
          else 3
        if (cls == 3) r += 1
        else if ((cls == 0 || cls == 1) && cls != prev) r += 1
        prev = cls
      }
      i += 1
    }
    r
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "graft_bpe_count"
}

/** Sliding-window minima over a long array in ONE pass — the fused
  * form of `transform(sequence(0, greatest(size(h)-w, 0)), j ->
  * array_min(slice(h, j+1, w)))` (txt_fingerprint's winnowing
  * window), which paid an interpreted lambda dispatch plus a slice
  * copy per window per row. Window j covers h[j .. min(j+w, n)-1]
  * (truncated at the end exactly like slice), a shorter-than-w
  * array yields its single whole-array minimum, array_min's null
  * handling is preserved (null elements are skipped; an empty or
  * all-null window yields a null element — so the empty-array input
  * returns [null], exactly like the pipeline) — output element for
  * element identical to the expression pipeline, property-specced
  * on the edges, so the DuckDB oracle replays unchanged.
  */
case class WindowMin(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(w >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = math.max(n - w, 0) + 1
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val end = math.min(i + w, n)
      var mn = Long.MaxValue
      var seen = false
      var j = i
      while (j < end) {
        if (!arr.isNullAt(j)) {
          val v = arr.getLong(j)
          if (v < mn) mn = v
          seen = true
        }
        j += 1
      }
      out(i) = if (seen) mn else null
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "graft_window_min"
}
