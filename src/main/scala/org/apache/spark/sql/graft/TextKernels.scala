package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row text kernels for the dedup / analysis operators.
  *
  * Round-1 built shingle sets, MinHash signatures and SimHash fingerprints
  * from composed built-ins (posexplode + window lead + dropDuplicates +
  * groupBy min/sum aggregates). Correct and declarative — but each
  * per-document structure paid 2-3 shuffles of the exploded (doc, shingle)
  * stream. These kernels compute the same structures in one tight JVM loop
  * per row, so signature/fingerprint building becomes a pure scan-side
  * projection: zero shuffles, embarrassingly parallel with input splits —
  * the shape that survives a 100 TB corpus (only the tiny signatures ever
  * move; document text never leaves the scan).
  *
  * Bit-compatibility contracts (guarded by TextKernelsParitySpec):
  *  - tokenization == `split(lower(trim(text)), "\\s+")` — implemented on
  *    the very same UTF8String methods Spark's Lower/StringTrim/StringSplit
  *    call, so there is no semantic drift to the DuckDB oracle.
  *  - hashes == Spark's `xxhash64(...)` (seed 42; the two-argument form
  *    chains hashLong then hashInt exactly as XxHash64 does), so LSH
  *    candidate sets are identical to the round-1 formulation.
  *  - set ordering == `array_sort` (UTF8String binary order), so the
  *    codegen'd sorted-merge intersect keeps working downstream.
  */
object TextKernels {

  private val WS = UTF8String.fromString("\\s+")
  private val SPACE = UTF8String.fromString(" ")
  private val HEX = "0123456789abcdef".toCharArray
  private val MD5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Exactly `split(lower(trim(text)), "\\s+")`. */
  def tokens(text: UTF8String): Array[UTF8String] =
    text.trim().toLowerCase().split(WS, -1)

  /** Sorted distinct k-token shingles (binary UTF8 order = array_sort). */
  def shingleSet(text: UTF8String, k: Int): ArrayData = {
    val t = tokens(text)
    if (t.length < k) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.TreeSet[UTF8String]()
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i + k <= t.length) {
      var j = 0
      while (j < k) { parts(j) = t(i + j); j += 1 }
      set.add(UTF8String.concatWs(SPACE, parts: _*))
      i += 1
    }
    new GenericArrayData(set.toArray.asInstanceOf[Array[Any]])
  }

  /** MinHash signature over a shingle set: per element h = xxhash64(s),
    * then perm p takes min of xxhash64(h, p) — identical values to the
    * explode + `min(xxhash64(col, lit(p)))` aggregate formulation
    * (XxHash64 chains children: hashInt(p, hashLong(h, 42))).
    * Returns null for an empty set (such docs had no signature row). */
  def minhashSig(sh: ArrayData, numPerms: Int): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return null
    val mins = new Array[Long](numPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(sh.getUTF8String(i), 42L)
      val hseed = XXH64.hashLong(h, 42L)
      var p = 0
      while (p < numPerms) {
        val v = XXH64.hashInt(p, hseed)
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** SimHash-64 over the (duplicate-preserving) token stream: bit b of the
    * fingerprint is set iff sum over tokens of (+1 if bit b of xxhash64(t)
    * else -1) is positive — identical to the explode + 64 bit-vote SUM
    * aggregate formulation. */
  def simhash64(text: UTF8String): Long = {
    val t = tokens(text)
    val votes = new Array[Int](64)
    var i = 0
    while (i < t.length) {
      val h = XXH64.hashUTF8String(t(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  /** SimHash-60 over the (duplicate-preserving) token stream, with the
    * per-token hash taken from md5 instead of xxhash64 so a SQL oracle can
    * mirror it exactly: h(t) = first 15 hex chars of md5(t) as a 60-bit
    * integer (DuckDB: `('0x' || substring(md5(t),1,15))::BIGINT`; Spark
    * builtins: `conv(substring(md5(t),1,15),16,10)`). Bit b of the
    * fingerprint is set iff the (+1/-1) bit-vote sum over tokens is
    * positive. 60 bits keep the value in the non-negative BIGINT range on
    * every engine. */
  def simhashMd5(text: UTF8String): Long = {
    val t = tokens(text)
    val votes = new Array[Int](60)
    val md = MD5.get()
    var i = 0
    while (i < t.length) {
      md.reset()
      val d = md.digest(t(i).getBytes)
      // first 15 hex nibbles of the digest, most significant first
      var h = 0L
      var n = 0
      while (n < 15) {
        val nib = if ((n & 1) == 0) (d(n >> 1) >> 4) & 0xf else d(n >> 1) & 0xf
        h = (h << 4) | nib
        n += 1
      }
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  private def md5Hex(s: UTF8String): String = {
    val md = MD5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(i * 2) = HEX((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** The `keep` lexicographically smallest md5 hex digests of the set's
    * elements, ascending, '|'-joined (winnowing-style fingerprint). Null
    * for an empty set (such docs had no fingerprint row). */
  def smallestDigests(sh: ArrayData, keep: Int): UTF8String = {
    val n = sh.numElements()
    if (n == 0) return null
    val top = new java.util.TreeSet[String]()
    var i = 0
    while (i < n) {
      top.add(md5Hex(sh.getUTF8String(i)))
      if (top.size > keep) top.pollLast()
      i += 1
    }
    UTF8String.fromString(String.join("|", top))
  }

  /** Sorted distinct xxhash64 values of the k-token shingles — the hashed
    * twin of [[shingleSet]]: h = xxhash64(shingle string), so downstream
    * frequency counts, prefix filters, candidate joins and intersect
    * counts operate on 8-byte longs instead of ~25-byte strings. Distinct
    * is taken over hashes; a 64-bit collision inside one document's set is
    * ~1e-14 — negligible even corpus-wide. */
  def shingleHashSet(text: UTF8String, k: Int): ArrayData = {
    val t = tokens(text)
    if (t.length < k) return new GenericArrayData(Array.empty[Long])
    val set = new java.util.TreeSet[java.lang.Long]()
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i + k <= t.length) {
      var j = 0
      while (j < k) { parts(j) = t(i + j); j += 1 }
      set.add(XXH64.hashUTF8String(UTF8String.concatWs(SPACE, parts: _*), 42L))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var n = 0
    while (it.hasNext) { out(n) = it.next(); n += 1 }
    new GenericArrayData(out)
  }

  /** MinHash signature from pre-hashed shingles (h = xxhash64(s), as
    * produced by [[shingleHashSet]]) — same values as [[minhashSig]] on
    * the string set. Null for an empty set. */
  def minhashSigFromHashes(hs: ArrayData, numPerms: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return null
    val mins = new Array[Long](numPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val hseed = XXH64.hashLong(hs.getLong(i), 42L)
      var p = 0
      while (p < numPerms) {
        val v = XXH64.hashInt(p, hseed)
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Merge-intersect size of two SORTED long arrays (the hashed twin of
    * SortedStringArrayIntersectSize — no byte-wise string compares). */
  def sortedLongIntersectSize(a: ArrayData, b: ArrayData): Int = {
    val n1 = a.numElements(); val n2 = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n1 && j < n2) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Token-window chunks for training-data preparation: whitespace
    * tokens re-joined into windows of `size` tokens advancing by
    * `stride` (< size ⇒ overlapping context windows). A document of
    * n <= size tokens yields exactly one chunk; otherwise
    * ceil((n-size)/stride)+1 chunks, the last one possibly short. */
  def chunkTokens(text: UTF8String, size: Int, stride: Int): ArrayData = {
    val t = tokens(text)
    val n = t.length
    val num = if (n <= size) 1 else ((n - size + stride - 1) / stride) + 1
    val out = new Array[Any](num)
    var i = 0
    while (i < num) {
      val start = i * stride
      val end = math.min(start + size, n)
      out(i) = UTF8String.concatWs(SPACE,
        java.util.Arrays.copyOfRange(t, start, end): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-document term frequencies: (term, count) over tokens(text),
    * terms in ascending binary order. All occurrences of a term within
    * one document land in one row, so term-frequency computation needs
    * no shuffle at all — only the (much smaller) distinct-terms stream
    * ever moves for downstream df counts. */
  def termCounts(text: UTF8String): ArrayData = {
    val t = tokens(text)
    val m = new java.util.TreeMap[UTF8String, Int]()
    var i = 0
    while (i < t.length) {
      m.merge(t(i), 1, (a, b) => a + b)
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var n = 0
    while (it.hasNext) {
      val e = it.next()
      out(n) = org.apache.spark.sql.catalyst.InternalRow(
        e.getKey, e.getValue)
      n += 1
    }
    new GenericArrayData(out)
  }

  private val ControlChars =
    java.util.regex.Pattern.compile("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]")

  /** Unicode NFC normalization + C0-control strip (newline/tab/CR kept)
    * — the canonicalization pass a crawl corpus needs before hashing or
    * tokenizing (decomposed é vs composed é would otherwise defeat
    * exact dedup and split vocabularies). NFC via `java.text.Normalizer`
    * mirrors DuckDB's `nfc_normalize` (both implement UAX #15); the
    * control class is a plain RE2/Java-identical character class. */
  def nfcClean(text: UTF8String): UTF8String = {
    val s = java.text.Normalizer.normalize(text.toString,
      java.text.Normalizer.Form.NFC)
    UTF8String.fromString(ControlChars.matcher(s).replaceAll(""))
  }

  /** Repetition signals over the token stream (the Gopher-style quality
    * rules): returns [total_bigrams, top_bigram_count, total_trigrams,
    * dup_trigram_occurrences] as longs, one HashMap pass per n-gram
    * order — no exploded n-gram stream ever leaves the row. Downstream
    * ratios (top-bigram fraction, duplicate-trigram fraction) are exact
    * long/long double divisions, so they cross engines bit-identically. */
  def repetitionStats(text: UTF8String): ArrayData = {
    val t = tokens(text)
    val n = t.length
    val bi = new java.util.HashMap[UTF8String, Int]()
    var i = 0
    while (i + 1 < n) {
      bi.merge(UTF8String.concatWs(SPACE, t(i), t(i + 1)), 1, (a, b) => a + b)
      i += 1
    }
    var topBi = 0L
    val bit = bi.values().iterator()
    while (bit.hasNext) { val c = bit.next(); if (c > topBi) topBi = c }
    val tri = new java.util.HashMap[UTF8String, Int]()
    i = 0
    while (i + 2 < n) {
      tri.merge(UTF8String.concatWs(SPACE, t(i), t(i + 1), t(i + 2)), 1,
        (a, b) => a + b)
      i += 1
    }
    var dupTri = 0L
    val trit = tri.values().iterator()
    while (trit.hasNext) { val c = trit.next(); if (c > 1) dupTri += c }
    new GenericArrayData(Array(
      math.max(n - 1, 0).toLong, topBi, math.max(n - 2, 0).toLong, dupTri))
  }

  /** Occurrence counts of tokens(text) in each dictionary (order given),
    * plus the union of all dictionaries in the LAST slot. One tokenize +
    * one hash probe per (token, dict) — replaces the interpreted
    * higher-order `filter(toks, _.isInCollection(dict))` per dictionary. */
  def stopHits(text: UTF8String,
               sets: Array[java.util.HashSet[UTF8String]]): ArrayData = {
    val t = tokens(text)
    val counts = new Array[Int](sets.length)
    var i = 0
    while (i < t.length) {
      var d = 0
      while (d < sets.length) {
        if (sets(d).contains(t(i))) counts(d) += 1
        d += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

case class ShingleSetExpr(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TextKernels.shingleSet(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextKernels.shingleSet($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ShingleHashSetExpr(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TextKernels.shingleHashSet(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextKernels.shingleHashSet($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MinHashSigFromHashesExpr(child: Expression, numPerms: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null on empty input set
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TextKernels.minhashSigFromHashes(input.asInstanceOf[ArrayData], numPerms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = org.apache.spark.sql.graft.TextKernels.minhashSigFromHashes($c, $numPerms);
      |${ev.isNull} = (${ev.value} == null);
      |""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SortedLongArrayIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.sortedLongIntersectSize(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.TextKernels.sortedLongIntersectSize($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class MinHashSigExpr(child: Expression, numPerms: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null on empty input set
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TextKernels.minhashSig(input.asInstanceOf[ArrayData], numPerms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = org.apache.spark.sql.graft.TextKernels.minhashSig($c, $numPerms);
      |${ev.isNull} = (${ev.value} == null);
      |""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHash64Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TextKernels.simhash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextKernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class NfcCleanExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TextKernels.nfcClean(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextKernels.nfcClean($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHashMd5Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TextKernels.simhashMd5(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextKernels.simhashMd5($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SmallestDigestsExpr(child: Expression, keep: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // null on empty input set
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TextKernels.smallestDigests(input.asInstanceOf[ArrayData], keep)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = org.apache.spark.sql.graft.TextKernels.smallestDigests($c, $keep);
      |${ev.isNull} = (${ev.value} == null);
      |""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ChunkTokensExpr(child: Expression, size: Int, stride: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(size > 0 && stride > 0 && stride <= size,
    s"need 0 < stride <= size, got size=$size stride=$stride")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TextKernels.chunkTokens(input.asInstanceOf[UTF8String], size, stride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextKernels.chunkTokens($c, $size, $stride)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class TermCountsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("term", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("tf", IntegerType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TextKernels.termCounts(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextKernels.termCounts($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TextKernels.repetitionStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextKernels.repetitionStats($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class StopHitsExpr(child: Expression, dicts: Seq[Seq[String]])
    extends UnaryExpression with ExpectsInputTypes {
  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] = {
    val all = dicts :+ dicts.flatten.distinct // union dict in last slot
    all.map { ws =>
      val s = new java.util.HashSet[UTF8String](ws.size * 2)
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray
  }
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TextKernels.stopHits(input.asInstanceOf[UTF8String], sets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopSets", sets,
      "java.util.HashSet[]")
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextKernels.stopHits($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points (bridges private[sql] ExpressionUtils). */
object TextExpressions {
  private def e(c: Column) = ExpressionUtils.expression(c)

  def shingleSet(text: Column, k: Int): Column =
    ExpressionUtils.column(ShingleSetExpr(e(text), k))
  def shingleHashSet(text: Column, k: Int): Column =
    ExpressionUtils.column(ShingleHashSetExpr(e(text), k))
  def minhashSigFromHashes(hs: Column, numPerms: Int): Column =
    ExpressionUtils.column(MinHashSigFromHashesExpr(e(hs), numPerms))
  def sortedLongIntersectSize(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedLongArrayIntersectSize(e(a), e(b)))
  def minhashSig(sh: Column, numPerms: Int): Column =
    ExpressionUtils.column(MinHashSigExpr(e(sh), numPerms))
  def simhash64(text: Column): Column =
    ExpressionUtils.column(SimHash64Expr(e(text)))
  def simhashMd5(text: Column): Column =
    ExpressionUtils.column(SimHashMd5Expr(e(text)))
  def nfcClean(text: Column): Column =
    ExpressionUtils.column(NfcCleanExpr(e(text)))
  def termCounts(text: Column): Column =
    ExpressionUtils.column(TermCountsExpr(e(text)))
  def chunkTokens(text: Column, size: Int, stride: Int): Column =
    ExpressionUtils.column(ChunkTokensExpr(e(text), size, stride))
  def smallestDigests(sh: Column, keep: Int): Column =
    ExpressionUtils.column(SmallestDigestsExpr(e(sh), keep))
  def stopHits(text: Column, dicts: Seq[Seq[String]]): Column =
    ExpressionUtils.column(StopHitsExpr(e(text), dicts))
  def repetitionStats(text: Column): Column =
    ExpressionUtils.column(RepetitionStatsExpr(e(text)))

  /** Spark's own runtime-join Bloom sketch as an aggregate over a LongType
    * hash column: returns the serialized filter bytes (one binary row).
    * Same machinery Spark's InjectRuntimeFilter rule uses — reused here
    * for benchmark-decontamination prefiltering. */
  def bloomAgg(hash: Column, estimatedItems: Long): Column =
    ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(e(hash), estimatedItems)
        .toAggregateExpression())

  /** Codegen'd membership probe against [[bloomAgg]] bytes (a driver-held
    * literal — the sketch is MB-scale regardless of corpus size). False
    * positives possible, false negatives not. */
  def bloomMightContain(bloomBytes: Array[Byte], hash: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(bloomBytes),
        e(hash)))
}
