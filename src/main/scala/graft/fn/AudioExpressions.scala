package graft.fn

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.AbstractDataType
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `audio_fingerprint64(content)` — 64-bit perceptual energy-band
  * fingerprint of a WAV/FLAC payload ([[graft.ext.Audio]]: 9 time
  * segments × 8 Haar octave bands, adjacent-segment energy
  * comparisons — the audio analog of `image_dhash64`); pair with
  * `hamming64` / the shared band-join pair stage for near-duplicate
  * audio detection. Null for undecodable or too-short payloads.
  */
case class AudioFingerprint64(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_fingerprint64"

  override protected def nullSafeEval(bytes: Any): Any = {
    val h = graft.ext.Audio.fingerprint64OrNull(bytes.asInstanceOf[Array[Byte]])
    if (h == null) null else h.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""
         |java.lang.Long ${ev.value}_h = graft.ext.Audio.fingerprint64OrNull($bytes);
         |if (${ev.value}_h == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_h.longValue();
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
