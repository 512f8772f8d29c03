package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `image_meta(binary)` — the codec metadata parse as a NATIVE
  * Catalyst expression (round 13): media columns get header-level
  * width/height/channels/format straight from SQL
  * (`SELECT image_meta(bytes).width FROM media`), with real parses
  * for PNG/BMP/JPEG and the GFTI container
  * ([[graft.ops.Multimodal.decodeMeta]]) and NULL for
  * corrupt/unknown bytes — the quarantine convention. Codegen calls
  * one static method (the [[NumericExpressions.Log2Fixed]]
  * discipline), so the expression rides whole-stage codegen instead
  * of falling back to an interpreted UDF.
  */
object ImageExpr {

  private val schema = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Static codegen entry: null for undecodable bytes. */
  def metaRowJ(bytes: Array[Byte]): InternalRow =
    graft.ops.Multimodal.decodeMeta(bytes) match {
      case Some(m) => InternalRow(m.width, m.height, m.channels,
        UTF8String.fromString(m.format))
      case None => null
    }

  case class ImageMeta(child: Expression) extends UnaryExpression {

    override def dataType: DataType = schema
    override def prettyName: String = "image_meta"
    override def nullable: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case BinaryType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"image_meta expects a binary column, got ${other.catalogString}")
      }

    override protected def nullSafeEval(v: Any): Any =
      metaRowJ(v.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, b =>
        s"""
           |${ev.value} = graft.functions.ImageExpr.metaRowJ($b);
           |if (${ev.value} == null) { ${ev.isNull} = true; }
         """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): ImageMeta =
      copy(child = newChild)
  }
}
