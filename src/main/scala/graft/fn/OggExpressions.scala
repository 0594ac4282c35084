package graft.fn

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.AbstractDataType
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `ogg_synth(doc_id)` — the deterministic Ogg Vorbis/Opus container
  * of [[graft.ext.OggFixtures]] as a per-row codegen kernel (q138's
  * corpus; the q137 pattern).
  */
case class OggSynth(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "ogg_synth"

  override protected def nullSafeEval(id: Any): Any =
    graft.ext.OggFixtures.stream(id.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, id =>
      s"${ev.value} = graft.ext.OggFixtures.stream($id);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `ogg_stream_meta(content)` — the CRC-verified [[graft.ext.Ogg]]
  * walk (pages + packet reassembly + Vorbis/Opus header parse) folded
  * to oracle-exact fields: codec, channels, rate, pre-skip, page and
  * packet counts, the final granule position, the duration it implies
  * (integer milliseconds at the codec's granule rate — 48 kHz for
  * Opus), comment count, vendor string, and the total audio payload
  * bytes after the header packets. Null for anything that is not a
  * well-formed single-stream Ogg Vorbis/Opus container.
  */
case class OggStreamMeta(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = OggStreamMeta.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "ogg_stream_meta"

  override protected def nullSafeEval(bytes: Any): Any =
    OggStreamMeta.metaOrNull(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""
         |org.apache.spark.sql.catalyst.InternalRow ${ev.value}_r =
         |  graft.fn.OggStreamMeta.metaOrNull($bytes);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OggStreamMeta {
  val Schema: StructType = StructType(Seq(
    StructField("codec", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("rate", LongType, nullable = false),
    StructField("pre_skip", IntegerType, nullable = false),
    StructField("n_pages", IntegerType, nullable = false),
    StructField("n_packets", IntegerType, nullable = false),
    StructField("last_granule", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_comments", IntegerType, nullable = false),
    StructField("vendor", StringType, nullable = false),
    StructField("audio_bytes", LongType, nullable = false)))

  def metaOrNull(bytes: Array[Byte]): InternalRow = {
    val m = graft.ext.Ogg.metaOrNull(bytes)
    if (m == null) return null
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(m.codec), m.channels, m.rate, m.preSkip,
      m.nPages, m.nPackets, m.lastGranule,
      m.lastGranule * 1000L / m.granuleRate, m.comments.length,
      UTF8String.fromString(m.vendor), m.audioBytes))
  }
}
