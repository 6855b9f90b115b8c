package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by interpreted eval and generated code. Keeping the
  * loops here means `doGenCode` is a single static call — the expression stays
  * inside whole-stage codegen without inlining large method bodies.
  */
object VectorOps {

  /** Cosine similarity over two float vectors with double accumulation in
    * index order — the exact fold order the DuckDB oracle uses
    * (`list_reduce(list_prepend(0.0, list_transform(...)))`), so results are
    * bit-identical across engines.
    */
  def cosineFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  /** Dot product of a float vector with a double vector (e.g. an LSH
    * hyperplane), double accumulation in index order.
    */
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    dot
  }

  /** One-pass symmetric int8 quantization of a float vector: codes are
    * floor(x * 127.0 / maxabs) as longs — exactly the s16 SQL pipeline
    * (cast-to-double transform → greatest fold → floor transform) collapsed
    * into one loop with ONE output allocation, bit-identical arithmetic.
    * A zero-norm vector returns an EMPTY array (the SQL path's
    * `maxabs > 0` row filter becomes `size(codes) > 0`).
    */
  def i8Codes(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(a.getFloat(i).toDouble)
      // A NaN element poisons the scale: treat the vector as zero-norm and
      // return the empty array (the defined degenerate case), instead of
      // silently keeping the row with floor(NaN)->0 codes (ADVICE r10).
      if (v != v) return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Long])
      if (v > maxabs) maxabs = v
      i += 1
    }
    if (maxabs <= 0.0)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Long])
    else {
      val out = new Array[Long](n)
      i = 0
      while (i < n) {
        out(i) = math.floor(a.getFloat(i).toDouble * 127.0 / maxabs).toLong
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  /** Dot product of two float vectors with double accumulation in index
    * order — the fold order of `aggregate(zip_with(a, b, (x, y) ->
    * CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0, +)` and of the DuckDB
    * list_reduce form, without the per-pair intermediate array.
    */
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    // The zip_with+aggregate form this replaces null-pads ragged pairs and
    // yields NULL; a silent min()-truncation would instead score a prefix.
    // Fail loudly so a length regression surfaces as an error, not a wrong
    // similarity (ADVICE r10).
    require(n == b.numElements(), s"dot_ff: length mismatch $n vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Squared L2 distance of two double vectors, accumulation in index
    * order — the fold order of `aggregate(zip_with(a, b, (x, y) ->
    * (x - y) * (x - y)), 0.0, +)` without the per-pair array.
    */
  def dist2DD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(), s"dist2_dd: length mismatch $n vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      val dx = a.getDouble(i) - b.getDouble(i)
      acc += dx * dx
      i += 1
    }
    acc
  }

  /** Exact dot product of two BIGINT code vectors, long accumulation in
    * index order — the codegen'd form of the oracle's integer list_reduce
    * fold. Replaces `aggregate(zip_with(...))` in the quadratic
    * query x candidate stage, which allocated a fresh 64-element array per
    * PAIR.
    */
  def dotLL(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(n == b.numElements(), s"dot_ll: length mismatch $n vs ${b.numElements()}")
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  /** First 4 bytes of MD5 as an unsigned 32-bit value in a long — identical
    * to `('0x' || substr(md5(s), 1, 8))::BIGINT` in DuckDB and
    * `conv(substring(md5(s), 1, 8), 16, 10)` in Spark SQL.
    */
  // One digest instance per task thread — getInstance() allocation would
  // otherwise dominate in per-position loops (winnowing runs this ~200x per
  // document).
  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def md5Prefix32(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Rabin–Karp rolling hashes of every k-char window: h_i = sum(c_j *
    * B^(k-1-j)) mod P computed in O(n) by rolling. Equals the DuckDB
    * per-position fold `(acc*257 + unicode(char)) % 1000000007` exactly
    * (ASCII text; chars are UTF-16 units).
    */
  def rollingHashes(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    val B = 257L; val P = 1000000007L
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    var pow = 1L
    var j = 0
    while (j < k - 1) { pow = pow * B % P; j += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + str.charAt(i)) % P; i += 1 }
    out(0) = h
    while (i < n) {
      h = (((h - str.charAt(i - k) * pow % P + P) % P) * B + str.charAt(i)) % P
      out(i - k + 1) = h
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Indexes of the `nprobe` nearest centroids to `v` by squared euclidean
    * distance, ascending (ties break toward the lower index — the same order
    * a stable sort over (distance, index) yields). `cents` is the flattened
    * row-major centroid matrix; the centroid count is cents.length/dim.
    * Selection is O(k*nprobe) insertion into a bounded prefix — nprobe is
    * 1-4 in practice, so no full sort.
    */
  def nearestCentroids(v: ArrayData, cents: ArrayData, dim: Int, nprobe: Int): ArrayData = {
    val k = cents.numElements() / dim
    val take = math.min(nprobe, k)
    val bestIdx = new Array[Int](take)
    val bestD = new Array[Double](take)
    var filled = 0
    var c = 0
    while (c < k) {
      var s = 0.0
      var i = 0
      while (i < dim) {
        val d = cents.getDouble(c * dim + i) - v.getDouble(i)
        s += d * d
        i += 1
      }
      // insert (s, c) into the sorted prefix; strict < keeps ties on the
      // earlier (lower) centroid index
      var pos = filled
      while (pos > 0 && s < bestD(pos - 1)) pos -= 1
      if (pos < take) {
        val end = math.min(filled, take - 1)
        var j = end
        while (j > pos) { bestD(j) = bestD(j - 1); bestIdx(j) = bestIdx(j - 1); j -= 1 }
        bestD(pos) = s; bestIdx(pos) = c
        if (filled < take) filled += 1
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bestIdx, filled))
  }

  /** Fused winnowing fingerprints (Schleimer/Wilkerson/Aiken): per-position
    * k-char hashes (Rabin–Karp rolling poly, or md5-prefix32 when `useMd5`),
    * sliding w-window minima via a monotonic deque, then sort+dedupe — all
    * in ONE pass with ONE output allocation. Value-identical to the
    * declarative `array_distinct(transform(..., i -> array_min(slice(hs, i,
    * w))))` pipeline (same hashes, same minima; distinct-set equality — the
    * caller sorts, so element order is free), but without materializing the
    * two intermediate length-n arrays per row that form cost t04/t06 ~6s of
    * bench time at sf0.1.
    */
  def winnowFps(s: UTF8String, k: Int, w: Int, useMd5: Boolean): ArrayData = {
    val str = s.toString
    val n = str.length
    val nh = n - k + 1
    val nw = nh - w + 1
    if (nw <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](nh)
    if (useMd5) {
      var p = 0
      while (p < nh) {
        hs(p) = md5Prefix32(UTF8String.fromString(str.substring(p, p + k)))
        p += 1
      }
    } else {
      val B = 257L; val P = 1000000007L
      var pow = 1L
      var j = 0
      while (j < k - 1) { pow = pow * B % P; j += 1 }
      var h = 0L
      var i = 0
      while (i < k) { h = (h * B + str.charAt(i)) % P; i += 1 }
      hs(0) = h
      while (i < n) {
        h = (((h - str.charAt(i - k) * pow % P + P) % P) * B + str.charAt(i)) % P
        hs(i - k + 1) = h
        i += 1
      }
    }
    // sliding-window minima: monotonic deque of candidate indices
    val mins = new Array[Long](nw)
    val dq = new Array[Int](nh)
    var head = 0; var tail = 0
    var i = 0
    while (i < nh) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) mins(i - w + 1) = hs(dq(head))
      i += 1
    }
    java.util.Arrays.sort(mins)
    var out = 1
    var j = 1
    while (j < nw) {
      if (mins(j) != mins(j - 1)) { mins(out) = mins(j); out += 1 }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(mins, out))
  }

  /** The mm07/mm11/st47/p03 stripe-energy perceptual hash in ONE pass:
    * stripe i (i = 0..63) sums the UTF-16 units at char positions ≡ i
    * (mod 64); bit i is set iff stripe_i * 64 > total, with 1L<<63
    * wrapping to the sign bit exactly like Spark's shiftleft. Value-
    * identical to the declarative transform/aggregate/sequence chain it
    * replaces (exact integer sums, same threshold), but O(n) instead of
    * O(64·n) per document and with zero per-stripe array allocations —
    * the HOF form cost ~30 min to index 2.5M documents at the r11 100x
    * probe; see SCALE.md r11 (the mm07-tier analog of the r10 int8
    * kernel lesson). Iterates by CODE POINT (surrogate-aware), not UTF-16
    * unit: the HOF chain (`ascii(substring(text, p, 1))`), Spark's
    * `length()` row filter, and the DuckDB oracle's
    * `unicode(text[p:p])` all index code points, so this is the one
    * convention under which all four agree on non-ASCII text too (r11
    * advisor note — previously safe only because fixtures are ASCII).
    */
  def phash64(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    val sums = new Array[Long](64)
    var j = 0 // UTF-16 index
    var p = 0 // code-point position
    while (j < n) {
      val cp = str.codePointAt(j)
      sums(p & 63) += cp
      j += Character.charCount(cp)
      p += 1
    }
    var tot = 0L
    var i = 0
    while (i < 64) { tot += sums(i); i += 1 }
    var ph = 0L
    i = 0
    while (i < 64) {
      if (sums(i) * 64 > tot) ph |= (1L << i)
      i += 1
    }
    ph
  }

  /** Per-100-codepoint frame energies: sums(f) = sum of code points at
    * positions [f*100, (f+1)*100) — the mm05/mm08/mm10 per-frame
    * `aggregate(sequence(f*100+1, ...), ascii(substring(text, p, 1)))`
    * chains collapsed to ONE surrogate-aware pass. The HOF forms run the
    * whole per-position body through interpreted lambda evaluation
    * (HigherOrderFunctions never enter whole-stage codegen) at ~us per
    * position plus a materialized position sequence per frame — measured
    * 63.2 s -> 0.18 s for 500 docs x 20k chars (mm05 shape) and
    * 245.9 s -> 0.27 s for 2,000 docs x 20k chars (mm10's nested shape);
    * the same class as the r11 pHash chain the 100x probe caught at
    * 42 min. Empty text yields one zero-energy frame, matching
    * `greatest(length(text), 1)` framing in both engines.
    */
  def frameEnergies(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    val nCp = str.codePointCount(0, n)
    val frames = (math.max(nCp, 1) - 1) / 100 + 1
    val sums = new Array[Long](frames)
    var j = 0 // UTF-16 index
    var p = 0 // code-point position
    while (j < n) {
      val cp = str.codePointAt(j)
      sums(p / 100) += cp
      j += Character.charCount(cp)
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sums)
  }

  private val HEX = "0123456789abcdef".toCharArray
  private def hexLower(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(i * 2) = HEX((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** md5 hex of every 100-codepoint frame, frames 0..cp/100 INCLUSIVE (the
    * mm03/mm08 `sequence(0, length div 100)` framing — the trailing frame
    * is empty when length % 100 == 0, hashing to md5("")). One byte walk:
    * frame boundaries are found by counting UTF-8 lead bytes, and each
    * frame hashes its UTF-8 byte span directly — replacing the per-frame
    * `md5(substring(text, f*100+1, 100))`. Measured ~parity with the
    * substring form at 20k-char docs (0.35 -> 0.31 s per 500; Spark 4's
    * substring is cheap even on non-ASCII) — kept as a kernel for
    * uniformity with the frame_energies convention and byte-exact framing
    * at codepoint boundaries, not as a hot-loop rescue.
    */
  def frameMd5s(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    var cps = 0
    var i = 0
    while (i < n) { if ((bytes(i) & 0xc0) != 0x80) cps += 1; i += 1 }
    val nFrames = cps / 100 + 1
    val out = new Array[Any](nFrames)
    val md = md5Local.get()
    var f = 0
    var start = 0
    i = 0
    var cp = 0
    while (f < nFrames) {
      val target = (f + 1) * 100
      while (i < n && cp < target) {
        i += 1
        while (i < n && (bytes(i) & 0xc0) == 0x80) i += 1
        cp += 1
      }
      md.reset()
      md.update(bytes, start, i - start)
      out(f) = UTF8String.fromString(hexLower(md.digest()))
      start = i
      f += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Every stride-th CODEPOINT of the input (0-based positions 0, stride,
    * 2*stride, ...), as a string — the mm04 1-D resize
    * `transform(sequence(1, length, 4), p -> substring(text, p, 1))`
    * collapsed to one byte walk. Measured ~2x at 20k-char docs
    * (0.19 -> 0.10 s per 500) — the win is the removed per-position
    * interpreted lambda + one-char UTF8String allocations, and the kernel
    * additionally defines the empty-string case the sequence form crashes
    * on (sequence(1, 0, 4) is illegal).
    */
  def strideSample(s: UTF8String, stride: Int): UTF8String = {
    require(stride > 0, s"stride_sample: stride must be positive: $stride")
    val bytes = s.getBytes
    val n = bytes.length
    val bb = new java.io.ByteArrayOutputStream(n / stride + 8)
    var i = 0
    var cp = 0
    while (i < n) {
      val start = i
      i += 1
      while (i < n && (bytes(i) & 0xc0) == 0x80) i += 1
      if (cp % stride == 0) bb.write(bytes, start, i - start)
      cp += 1
    }
    UTF8String.fromBytes(bb.toByteArray)
  }

  /** Distinct word 5-gram shingles of a single-space-tokenized text, one
    * byte pass (r13 — the shingle family's `distinct()` removal). Replaces
    *   split(text,' ') -> filter(size>=5) -> explode(sequence) ->
    *   concat_ws(' ', slice(t,p,5)) -> distinct()
    * whose `distinct()` shuffled the FULL (doc_id, shingle-string) table —
    * the single heaviest exchange in d02/d03/d08/d19/d27/st42 and p07's
    * per-trigger `sh` append. Per-doc dedup is row-local, so given the
    * pipeline-wide doc_id-uniqueness invariant (T.documents PK; one row
    * per doc per trigger in p07/st42) the global distinct equals the
    * per-doc distinct and no shuffle is needed at all.
    *
    * Byte-exactness: `split` on the single-space regex makes tokens the
    * maximal non-space runs (empty runs included) between single spaces,
    * so joining 5 CONSECUTIVE tokens with ' ' (concat_ws never skips empty
    * strings, and split never yields nulls) reproduces exactly the
    * original bytes from the start of token p to the end of token p+4 —
    * each shingle is a contiguous byte slice of the input, ASCII-space
    * boundaries are unambiguous in UTF-8, and UTF8String equality is byte
    * equality, matching the DF distinct. Fewer than 5 tokens -> empty
    * array (the caller's explode then drops the row, the old
    * filter(size(t) >= 5) shape).
    */
  def wordShingles5(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // token start offsets: 0, and i+1 for every space byte at i
    var nTok = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' '.toByte) nTok += 1; i += 1 }
    if (nTok < 5)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](0))
    val starts = new Array[Int](nTok)
    var t = 1
    i = 0
    while (i < n) {
      if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String](nTok * 2)
    var p = 0
    while (p <= nTok - 5) {
      val start = starts(p)
      val end = if (p + 5 < nTok) starts(p + 5) - 1 else n
      seen.add(UTF8String.fromBytes(bytes, start, end - start))
      p += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** 32-bit SimHash over a token array: per bit, +1/-1 votes weighted by
    * token multiplicity; bit set iff the vote sum is positive.
    */
  def simHash32(tokens: ArrayData): Long = {
    val counts = new Array[Int](32)
    var i = 0
    while (i < tokens.numElements()) {
      val h = md5Prefix32(tokens.getUTF8String(i))
      var b = 0
      while (b < 32) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** `cosine_sim(array<float>, array<float>) -> double`, codegen'd. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosineFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorOps.cosineFF($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `dot_fd(array<float>, array<double>) -> double`, codegen'd. */
case class DotFD(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotFD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorOps.dotFD($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `i8_codes(array<float>) -> array<long>`: one-pass symmetric int8
  * quantization (empty array for zero-norm inputs), codegen'd.
  */
case class I8Codes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VectorOps.i8Codes(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.i8Codes($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `dot_ff(array<float>, array<float>) -> double`, codegen'd. */
case class DotFF(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorOps.dotFF($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `dist2_dd(array<double>, array<double>) -> double`, codegen'd. */
case class Dist2DD(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dist2DD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorOps.dist2DD($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `dot_ll(array<bigint>, array<bigint>) -> bigint`, codegen'd. */
case class DotLL(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotLL(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorOps.dotLL($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `rolling_hashes(string) -> array<long>` (k=8 windows), codegen'd. */
case class RollingHashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VectorOps.rollingHashes(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.rollingHashes($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `md5_prefix32(string) -> long`: first 4 MD5 bytes as an unsigned 32-bit
  * value, codegen'd. The native form of the cross-engine hash idiom
  * `cast(conv(substring(md5(x), 1, 8), 16, 10) as bigint)` — one digest, no
  * hex-string materialization or radix parse.
  */
case class Md5Prefix32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    VectorOps.md5Prefix32(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.md5Prefix32($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `nearest_centroids(array<double> v, array<double> flat_centroids, dim,
  * nprobe) -> array<int>`: the IVF coarse-quantizer probe as a codegen'd
  * expression — replaces a per-row Scala UDF closing over a broadcast
  * K-means model, keeping the probe inside whole-stage codegen.
  */
case class NearestCentroids(left: Expression, right: Expression,
    dim: Int, nprobe: Int) extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any, c: Any): Any =
    VectorOps.nearestCentroids(
      v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], dim, nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.VectorOps.nearestCentroids($v, $c, $dim, $nprobe);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `winnow_poly(string)` / `winnow_md5(string)` -> array<long>: fused
  * winnowing fingerprints (k=8 shingles, w=4 window minima, distinct,
  * sorted), codegen'd. See [[VectorOps.winnowFps]].
  */
case class WinnowFps(child: Expression, k: Int, w: Int, useMd5: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VectorOps.winnowFps(v.asInstanceOf[UTF8String], k, w, useMd5)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorOps.winnowFps($c, $k, $w, $useMd5)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `phash64(string) -> long`: one-pass stripe-energy perceptual hash,
  * codegen'd. See [[VectorOps.phash64]].
  */
case class PHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    VectorOps.phash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.phash64($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `frame_energies(string) -> array<long>`: per-100-codepoint frame
  * energy sums, one pass, codegen'd. See [[VectorOps.frameEnergies]].
  */
case class FrameEnergies(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VectorOps.frameEnergies(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.frameEnergies($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `frame_md5s(string) -> array<string>`: md5 hex per 100-codepoint frame
  * (trailing empty frame included), one byte walk, codegen'd. See
  * [[VectorOps.frameMd5s]].
  */
case class FrameMd5s(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VectorOps.frameMd5s(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.frameMd5s($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `stride_sample(string, stride) -> string`: every stride-th codepoint,
  * one byte walk, codegen'd. See [[VectorOps.strideSample]].
  */
case class StrideSample(child: Expression, stride: Int) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    VectorOps.strideSample(v.asInstanceOf[UTF8String], stride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.strideSample($c, $stride)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `word_shingles5(string) -> array<string>`: distinct word 5-gram
  * shingles, one byte pass, codegen'd. See [[VectorOps.wordShingles5]].
  */
case class WordShingles5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VectorOps.wordShingles5(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.wordShingles5($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `simhash32(array<string>) -> long`, codegen'd. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    VectorOps.simHash32(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.simHash32($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-API entry points; the functions resolve through the registry, so
  * sessions must install [[graft.GraftExtensions]]
  * (`spark.sql.extensions=graft.GraftExtensions`).
  */
object F {
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
  def dotFD(a: Column, b: Column): Column = call_function("dot_fd", a, b)
  def i8Codes(a: Column): Column = call_function("i8_codes", a)
  def dotLL(a: Column, b: Column): Column = call_function("dot_ll", a, b)
  def dotFF(a: Column, b: Column): Column = call_function("dot_ff", a, b)
  def dist2DD(a: Column, b: Column): Column = call_function("dist2_dd", a, b)
  def simhash32(tokens: Column): Column = call_function("simhash32", tokens)
  def phash64(text: Column): Column = call_function("phash64", text)
  def frameEnergies(text: Column): Column = call_function("frame_energies", text)
  def frameMd5s(text: Column): Column = call_function("frame_md5s", text)
  def wordShingles5(text: Column): Column = call_function("word_shingles5", text)
  def strideSample(text: Column, stride: Int): Column =
    call_function("stride_sample", text, org.apache.spark.sql.functions.lit(stride))
  /** Rabin–Karp rolling hash of every k-char window, one O(n) pass. */
  def rollingHashes(s: Column, k: Int): Column =
    call_function("rolling_hashes", s, org.apache.spark.sql.functions.lit(k))
  def nearestCentroids(v: Column, flatCentroids: Column, dim: Int, nprobe: Int): Column =
    call_function("nearest_centroids", v, flatCentroids,
      org.apache.spark.sql.functions.lit(dim), org.apache.spark.sql.functions.lit(nprobe))
  /** k smallest structs (lexicographic), ascending — partial-mergeable heap. */
  def topkStructs(c: Column, k: Int): Column =
    call_function("topk_structs", c, org.apache.spark.sql.functions.lit(k))

  val injections: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (es: Seq[Expression]) => CosineSim(es(0), es(1))),
    (FunctionIdentifier("dot_fd"),
      new ExpressionInfo(classOf[DotFD].getName, "dot_fd"),
      (es: Seq[Expression]) => DotFD(es(0), es(1))),
    (FunctionIdentifier("i8_codes"),
      new ExpressionInfo(classOf[I8Codes].getName, "i8_codes"),
      (es: Seq[Expression]) => I8Codes(es.head)),
    (FunctionIdentifier("dot_ll"),
      new ExpressionInfo(classOf[DotLL].getName, "dot_ll"),
      (es: Seq[Expression]) => DotLL(es(0), es(1))),
    (FunctionIdentifier("dot_ff"),
      new ExpressionInfo(classOf[DotFF].getName, "dot_ff"),
      (es: Seq[Expression]) => DotFF(es(0), es(1))),
    (FunctionIdentifier("dist2_dd"),
      new ExpressionInfo(classOf[Dist2DD].getName, "dist2_dd"),
      (es: Seq[Expression]) => Dist2DD(es(0), es(1))),
    (FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (es: Seq[Expression]) => SimHash32(es.head)),
    (FunctionIdentifier("phash64"),
      new ExpressionInfo(classOf[PHash64].getName, "phash64"),
      (es: Seq[Expression]) => PHash64(es.head)),
    (FunctionIdentifier("frame_energies"),
      new ExpressionInfo(classOf[FrameEnergies].getName, "frame_energies"),
      (es: Seq[Expression]) => FrameEnergies(es.head)),
    (FunctionIdentifier("frame_md5s"),
      new ExpressionInfo(classOf[FrameMd5s].getName, "frame_md5s"),
      (es: Seq[Expression]) => FrameMd5s(es.head)),
    (FunctionIdentifier("word_shingles5"),
      new ExpressionInfo(classOf[WordShingles5].getName, "word_shingles5"),
      (es: Seq[Expression]) => WordShingles5(es.head)),
    (FunctionIdentifier("stride_sample"),
      new ExpressionInfo(classOf[StrideSample].getName, "stride_sample"),
      (es: Seq[Expression]) => StrideSample(es.head,
        es(1).eval().asInstanceOf[Number].intValue)),
    (FunctionIdentifier("rolling_hashes"),
      new ExpressionInfo(classOf[RollingHashes].getName, "rolling_hashes"),
      // optional second arg = window length k (foldable int), default 8
      (es: Seq[Expression]) => RollingHashes(es.head,
        if (es.sizeIs > 1) es(1).eval().asInstanceOf[Number].intValue else 8)),
    (FunctionIdentifier("md5_prefix32"),
      new ExpressionInfo(classOf[Md5Prefix32].getName, "md5_prefix32"),
      (es: Seq[Expression]) => Md5Prefix32(es.head)),
    (FunctionIdentifier("winnow_poly"),
      new ExpressionInfo(classOf[WinnowFps].getName, "winnow_poly"),
      (es: Seq[Expression]) => WinnowFps(es.head, 8, 4, useMd5 = false)),
    (FunctionIdentifier("winnow_md5"),
      new ExpressionInfo(classOf[WinnowFps].getName, "winnow_md5"),
      (es: Seq[Expression]) => WinnowFps(es.head, 8, 4, useMd5 = true)),
    (FunctionIdentifier("nearest_centroids"),
      new ExpressionInfo(classOf[NearestCentroids].getName, "nearest_centroids"),
      (es: Seq[Expression]) => NearestCentroids(es(0), es(1),
        es(2).eval().asInstanceOf[Int], es(3).eval().asInstanceOf[Int])),
    // topk_structs(v, k): the k SMALLEST values of v (struct ordering =
    // lexicographic) as an ascending array — Spark's partial-mergeable
    // bounded-heap aggregate (CollectTopK), surfaced so per-key top-k
    // retrieval is an O(k) heap per partition merged map-side instead of
    // a rank window that SORTS every candidate row per key. For a
    // "largest first" top-k, negate the score field in the struct.
    (FunctionIdentifier("topk_structs"),
      new ExpressionInfo("org.apache.spark.sql.catalyst.expressions." +
        "aggregate.CollectTopK", "topk_structs"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.graftshims.GraftSqlShims.collectTopK(
          es(0), es(1).eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"topk_structs k must be a literal int, got $other")
          })),
  )
}

/** Optimizer strength reduction: rewrite the cross-engine md5-prefix idiom
  * `cast(conv(substring(md5(x), 1, 8), 16, 10) as bigint)` to the native
  * [[Md5Prefix32]] — one digest instead of digest → hex string → substring →
  * radix parse. The idiom sits in the hottest per-char loops (winnowing
  * fingerprints evaluate it once per document position), including inside
  * higher-order-function lambdas, which `transformAllExpressions` reaches.
  * Injected by [[graft.GraftExtensions]] via `injectOptimizerRule`.
  */
object Md5PrefixStrengthReduction
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Literal, Md5, Substring}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case cast: Cast if cast.dataType == LongType && isConvMd5(cast.child) =>
        Md5Prefix32(strArg(cast.child))
    }

  private def isConvMd5(e: Expression): Boolean = e match {
    case conv: Conv => conv.children match {
      case Seq(sub: Substring, Literal(16, IntegerType), Literal(10, IntegerType)) =>
        sub.children match {
          case Seq(m: Md5, Literal(1, IntegerType), Literal(8, IntegerType)) =>
            m.child match {
              case c: Cast => c.dataType == BinaryType && c.child.dataType == StringType
              case other => other.dataType == StringType
            }
          case _ => false
        }
      case _ => false
    }
    case _ => false
  }

  private def strArg(e: Expression): Expression = {
    val m = e.asInstanceOf[Conv].children.head.asInstanceOf[Substring]
      .children.head.asInstanceOf[Md5]
    m.child match {
      case c: Cast if c.dataType == BinaryType => c.child
      case other => other
    }
  }
}
