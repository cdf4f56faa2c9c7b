package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * PostgreSQL-hstore text rendering of a `map<string,string>` column:
 * `"k"=>"v", "k2"=>"v2"`, keys sorted for determinism, null-valued
 * entries skipped, null map → null — exactly the semantics of the
 * `array_join(transform(array_sort(map_keys(m)), …))` composition it
 * replaces, in one JVM pass per row instead of three interpreted
 * higher-order passes plus a per-key map probe.
 */
object HstoreRender {
  def render(m: MapData): UTF8String = {
    val n = m.numElements()
    val keys = m.keyArray()
    val vals = m.valueArray()
    val idx = Array.range(0, n)
    val ks = Array.tabulate(n)(i => keys.getUTF8String(i))
    // keys in a map are unique; sort index by key (binary order —
    // matches Spark's array_sort on strings)
    val sorted = idx.sortBy(i => ks(i))
    val sb = new java.lang.StringBuilder()
    var first = true
    var j = 0
    while (j < sorted.length) {
      val i = sorted(j)
      if (!vals.isNullAt(i)) {
        if (!first) sb.append(", ")
        first = false
        sb.append('"').append(ks(i).toString).append("\"=>\"")
          .append(vals.getUTF8String(i).toString).append('"')
      }
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def renderEval(input: Any): UTF8String = render(input.asInstanceOf[MapData])
}

/** `hstore_render(map<string,string>) -> string` */
case class HstoreRenderExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(StringType, StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hstore_render expects map<string,string>, got $other")
  }
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any = HstoreRender.renderEval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HstoreRender.renderEval($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "hstore_render"
}
