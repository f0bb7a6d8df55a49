package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: membership probe of a LONG column against
  * a pre-built [[org.apache.spark.util.sketch.BloomFilter]] (Spark's
  * public sketch API) embedded in the plan.
  *
  * This is the "compressed broadcast" primitive for decontamination-style
  * anti-membership at 100 TB: when the probe set is too large to ship as
  * raw strings (a full eval-suite shingle set), its bloom filter is
  * ~10 bits/item at 1% fpp — two orders of magnitude smaller — and the
  * probe is two bit-tests per row inside whole-stage codegen. False
  * positives are the caller's contract (follow with an exact join on the
  * survivors); false negatives cannot occur.
  *
  * The filter ships as its serialized bytes (java-serializable case-class
  * field); each executor deserializes once into a `@transient lazy val`
  * and the generated code calls back through a reference to this
  * expression instance — same pattern Spark's own runtime-filtering
  * `BloomFilterMightContain` uses, built here on the public sketch API.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a BIGINT input (hash the value " +
        s"first), got ${dt.sql}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  def mightContain(h: Long): Boolean = filter.mightContainLong(h)

  override def nullSafeEval(v: Any): Any =
    mightContain(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, v => s"$ref.mightContain($v)")
  }

  override protected def withNewChildInternal(c: Expression)
  : BloomMightContain = copy(child = c)
}

object BloomMightContain {

  def apply(hashed: Column, bloomBytes: Array[Byte]): Column =
    Bridge.column(BloomMightContain(Bridge.expression(hashed), bloomBytes))

  /** Serialize a built filter for embedding in the expression. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
