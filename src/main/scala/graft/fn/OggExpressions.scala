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

/** `vorbis_setup_stats(content)` — the [[graft.ext.VorbisSetup]]
  * codebook parse (LSB-first bitpack, sync, ordered/sparse length
  * lists, canonical first-fit codeword assembly, Kraft completeness,
  * VQ lookup tables) folded to oracle-exact integers. `cw_sum` is the
  * sum of every assigned canonical codeword value — the direct gate
  * on the assembly trie. Null for anything that is not a well-formed
  * Ogg VORBIS container (Opus has no Vorbis setup).
  */
case class VorbisSetupStats(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = VorbisSetupStats.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "vorbis_setup_stats"

  override protected def nullSafeEval(bytes: Any): Any =
    VorbisSetupStats.statsOrNull(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""
         |org.apache.spark.sql.catalyst.InternalRow ${ev.value}_r =
         |  graft.fn.VorbisSetupStats.statsOrNull($bytes);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VorbisSetupStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_books", IntegerType, nullable = false),
    StructField("dim_sum", LongType, nullable = false),
    StructField("entries_sum", LongType, nullable = false),
    StructField("used_sum", LongType, nullable = false),
    StructField("maxlen", IntegerType, nullable = false),
    StructField("lookup_books", IntegerType, nullable = false),
    StructField("lookup_values_sum", LongType, nullable = false),
    StructField("cw_sum", LongType, nullable = false),
    StructField("complete_books", IntegerType, nullable = false)))

  def statsOrNull(bytes: Array[Byte]): InternalRow = {
    val pk = graft.ext.Ogg.packetsOrNull(bytes)
    if (pk == null || pk.length < 3) return null
    val s = graft.ext.VorbisSetup.setupOrNull(pk(2))
    if (s == null) return null
    var dims = 0L; var entries = 0L; var used = 0L; var maxLen = 0
    var lookups = 0; var lv = 0L; var cw = 0L; var complete = 0
    for (b <- s.codebooks) {
      dims += b.dimensions
      entries += b.entries
      used += b.usedEntries
      maxLen = math.max(maxLen, b.maxLength)
      if (b.lookupType != 0) lookups += 1
      lv += b.lookupValues
      var i = 0
      while (i < b.entries) {
        if (b.lengths(i) > 0) cw += b.codewords(i)
        i += 1
      }
      if (b.complete) complete += 1
    }
    new GenericInternalRow(Array[Any](
      s.codebooks.length, dims, entries, used, maxLen,
      lookups, lv, cw, complete))
  }
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
