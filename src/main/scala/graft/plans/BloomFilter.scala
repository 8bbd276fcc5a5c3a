package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bloom-filter runtime pre-filter: `graft_bloom(h, n, fpp)` (aggregate →
  * serialized filter as BINARY) + `graft_might_contain(filter, h)` (scalar
  * membership probe).
  *
  * The 100 TB join-avoidance pattern: aggregate the SMALL side of a semi-join
  * shape (a benchmark/eval corpus, a blocklist) into a fixed-size bitset —
  * partial-aggregable, merged by bitwise OR, a few hundred KB regardless of
  * corpus size — then probe it as a scalar subquery in the big side's scan
  * filter, so the 100 TB relation is cut BEFORE it reaches the shuffle. No
  * false negatives means an exact join downstream of the probe returns
  * exactly the un-prefiltered result; the fpp knob only trades filter size
  * against how much of the big side is cut. This is the same architecture as
  * engine-internal runtime filtering (Spark's InjectRuntimeFilter), exposed
  * as a user-callable pair so pipelines can build the filter ONCE and reuse
  * it across many scans.
  *
  * Double hashing (Kirsch-Mitzenheimer): bit_i = h1 + i·h2 over a splitmix64
  * finalizer, so k probes cost two multiplies, not k hash evaluations.
  */
object Bloom {

  /** splitmix64 finalizer — avalanching mix of a 64-bit value. */
  @inline def mix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Optimal bit count for n items at false-positive rate p, rounded up to a
    * whole word; capped so numBits stays an Int (≤ 2^31 bits = 256 MB).
    */
  def numBits(n: Long, p: Double): Int = {
    val m = math.ceil(-n * math.log(p) / (math.log(2) * math.log(2)))
    val words = math.max(1L, math.ceil(m / 64.0).toLong)
    // words * 64 must stay a valid Int: at exactly 2^31 bits the .toInt below
    // would wrap negative, so the cap is the largest word count whose bit
    // count still fits in Int.MaxValue (2^31 - 64 bits ≈ 256 MB)
    require(words * 64 <= Int.MaxValue.toLong,
      s"bloom filter too large: n=$n fpp=$p needs ${words * 64} bits")
    (words * 64).toInt
  }

  def numHashes(n: Long, bits: Int): Int =
    math.max(1, math.round(bits.toDouble / n * math.log(2)).toInt)

  /** Mutable filter state: a word-aligned bitset + probe count. */
  final class Filter(val bits: Int, val k: Int, val words: Array[Long]) {
    def this(bits: Int, k: Int) = this(bits, k, new Array[Long](bits / 64))

    @inline private def setBit(i: Int): Unit =
      words(i >>> 6) |= (1L << (i & 63))
    @inline private def getBit(i: Int): Boolean =
      (words(i >>> 6) & (1L << (i & 63))) != 0L

    def put(x: Long): Unit = {
      val h1 = mix64(x)
      val h2 = mix64(x ^ 0xA5A5A5A5A5A5A5A5L) | 1L
      var i = 0
      while (i < k) {
        setBit((((h1 + i * h2) % bits + bits) % bits).toInt)
        i += 1
      }
    }

    def mightContain(x: Long): Boolean = {
      val h1 = mix64(x)
      val h2 = mix64(x ^ 0xA5A5A5A5A5A5A5A5L) | 1L
      var i = 0
      while (i < k) {
        if (!getBit((((h1 + i * h2) % bits + bits) % bits).toInt)) return false
        i += 1
      }
      true
    }

    def orInPlace(o: Filter): Filter = {
      require(o.bits == bits && o.k == k,
        s"merging incompatible bloom filters: ($bits,$k) vs (${o.bits},${o.k})")
      var i = 0
      while (i < words.length) { words(i) |= o.words(i); i += 1 }
      this
    }

    def serialize(): Array[Byte] = {
      val bos = new ByteArrayOutputStream(8 + words.length * 8)
      val out = new DataOutputStream(bos)
      out.writeInt(bits)
      out.writeInt(k)
      words.foreach(out.writeLong)
      out.flush()
      bos.toByteArray
    }
  }

  def deserialize(bytes: Array[Byte]): Filter = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val bits = in.readInt()
    val k = in.readInt()
    val words = new Array[Long](bits / 64)
    var i = 0
    while (i < words.length) { words(i) = in.readLong(); i += 1 }
    new Filter(bits, k, words)
  }
}

/** `graft_bloom(h BIGINT, n INT-literal, fpp DOUBLE-literal) → BINARY` —
  * builds a Bloom filter over the column. Capacity `n` is a planning knob
  * (the expected distinct count); overshooting it degrades the fpp, never
  * correctness. Null inputs are skipped, matching COUNT-style aggregates.
  */
case class BloomAgg(
    child: Expression,
    nExpr: Expression,
    fppExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Bloom.Filter] {

  private lazy val n: Long = nExpr.eval(InternalRow.empty) match {
    case i: Int  => i.toLong
    case l: Long => l
    case other   => throw new IllegalArgumentException(s"n must be an integer literal, got $other")
  }
  private lazy val fpp: Double = fppExpr.eval(InternalRow.empty) match {
    case d: Double => d
    case other     => throw new IllegalArgumentException(s"fpp must be a double literal, got $other")
  }

  override def createAggregationBuffer(): Bloom.Filter = {
    require(n > 0, s"graft_bloom: n must be positive, got $n")
    require(fpp > 0.0 && fpp < 1.0, s"graft_bloom: fpp must be in (0,1), got $fpp")
    val bits = Bloom.numBits(n, fpp)
    new Bloom.Filter(bits, Bloom.numHashes(n, bits))
  }

  override def update(buf: Bloom.Filter, input: InternalRow): Bloom.Filter = {
    val v = child.eval(input)
    if (v != null) buf.put(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Bloom.Filter, b2: Bloom.Filter): Bloom.Filter = b1.orInPlace(b2)

  override def eval(buf: Bloom.Filter): Any = buf.serialize()

  override def serialize(buf: Bloom.Filter): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): Bloom.Filter = Bloom.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, nExpr, fppExpr)
  override def prettyName: String = "graft_bloom"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && nExpr.foldable && fppExpr.foldable &&
        (nExpr.dataType == IntegerType || nExpr.dataType == LongType) &&
        fppExpr.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (bigint, int literal, double literal), got " +
        s"(${child.dataType.simpleString}, ${nExpr.dataType.simpleString} foldable=${nExpr.foldable}, " +
        s"${fppExpr.dataType.simpleString} foldable=${fppExpr.foldable})")

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren(0), nExpr = newChildren(1), fppExpr = newChildren(2))
}

/** `graft_might_contain(filter BINARY, h BIGINT) → BOOLEAN` — membership
  * probe. The filter operand is typically an uncorrelated scalar subquery
  * (`(SELECT graft_bloom(...) FROM small_side)`), which Spark executes once
  * and feeds in as a constant — the probe itself stays inside whole-stage
  * codegen. The deserialized bitset is cached per filter-object identity, so
  * a scan probes millions of rows against one decode.
  */
case class MightContain(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain"

  @transient private var cached: (Array[Byte], Bloom.Filter) = _

  /** Probe with a decode cache; races just re-decode. Identity hit is the
    * constant-filter fast path (one decode per task); the content-equality
    * fallback defends against callers that route the filter through a row
    * (accessors copy binary values per row — a memcmp beats re-decoding,
    * though such plans should inline the filter as a literal instead).
    */
  def test(bytes: Array[Byte], v: Long): Boolean = {
    var c = cached
    if (c == null || !((c._1 eq bytes) || java.util.Arrays.equals(c._1, bytes))) {
      c = (bytes, Bloom.deserialize(bytes))
      cached = c
    }
    c._2.mightContain(v)
  }

  override protected def nullSafeEval(bloom: Any, value: Any): Any =
    test(bloom.asInstanceOf[Array[Byte]], value.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mightContain", this, classOf[MightContain].getName)
    nullSafeCodeGen(ctx, ev, (bloom, value) => s"${ev.value} = $ref.test($bloom, $value);")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (binary, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : MightContain = copy(left = newLeft, right = newRight)
}
