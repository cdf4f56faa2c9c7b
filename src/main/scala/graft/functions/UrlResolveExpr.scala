package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * RFC 3986 §5 reference resolution as ONE tight JVM pass — the
 * engine behind [[graft.operators.Robots.resolveUrl]].
 *
 * The pure-Column composition (eight regex nodes + an `aggregate`
 * segment stack) is semantically identical but CODEGEN-HOSTILE inside
 * [[graft.operators.Robots.resolveRedirects]]'s hop loop:
 * CollapseProject re-inlines the whole tree into every downstream
 * reference at every hop, and the registered query's wall went 2.1 s →
 * 5.8 s on plan compilation alone. This expression keeps the plan node
 * TINY (codegen emits one static call), with precompiled patterns and
 * plain string math per row — the [[HashExpressions]] playbook.
 *
 * Semantics (bit-identical to the Column composition it replaced,
 * spec-pinned in RobotsSpec):
 *  - a base that is not an absolute URL cannot anchor resolution —
 *    the (fragment-stripped) ref passes through raw;
 *  - empty ref → base minus fragment; absolute ref → itself;
 *  - `//authority…` takes the base scheme; `/rooted` takes
 *    scheme+authority with dot segments removed (§5.2.4: `.` skipped,
 *    `..` pops never past the root, a trailing `.`/`..` keeps the
 *    trailing slash); `?query` replaces the base query; a relative
 *    path merges onto the base directory (§5.2.3) then removes dot
 *    segments. Fragments are dropped (a fetch target has none).
 */
object UrlResolve {

  private val AbsBase =
    Pattern.compile("^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]")
  private val SchemeAuth =
    Pattern.compile("^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)")
  private val RefScheme = Pattern.compile("^[A-Za-z][A-Za-z0-9+.-]*:")

  /** §5.2.4 remove_dot_segments over a rooted path (the Column
    * `aggregate` stack's exact semantics). */
  def removeDotSegments(path: String): String = {
    val segs = path.split("/", -1)
    val stack = new java.util.ArrayList[String](segs.length)
    var i = 0
    while (i < segs.length) {
      segs(i) match {
        case "." => ()
        case ".." => if (stack.size > 1) stack.remove(stack.size - 1)
        case s => stack.add(s)
      }
      i += 1
    }
    val last = if (segs.isEmpty) "" else segs(segs.length - 1)
    if (last == "." || last == "..") stack.add("")
    String.join("/", stack)
  }

  private def cutAt(s: String, c: Char): String = {
    val i = s.indexOf(c)
    if (i >= 0) s.substring(0, i) else s
  }

  def resolve(base0: String, ref0: String): String = {
    val b = if (base0 == null) "" else base0
    val r = cutAt(if (ref0 == null) "" else ref0, '#')
    if (!AbsBase.matcher(b).lookingAt()) return r
    if (r.isEmpty) return cutAt(b, '#')
    if (RefScheme.matcher(r).lookingAt()) return r
    val m = SchemeAuth.matcher(b)
    m.lookingAt() // guaranteed by the AbsBase check
    val scheme = m.group(1)
    if (r.startsWith("//")) return scheme + ":" + r
    val prefix = scheme + "://" + m.group(2)
    val afterAuth = cutAt(b.substring(m.end()), '#')
    val pathQ = if (afterAuth.isEmpty) "/" else afterAuth
    val bPath = cutAt(pathQ, '?')
    val qi = r.indexOf('?')
    val refPath = if (qi >= 0) r.substring(0, qi) else r
    val refQuery = if (qi >= 0) r.substring(qi) else ""
    if (r.startsWith("/")) prefix + removeDotSegments(refPath) + refQuery
    else if (r.startsWith("?")) prefix + bPath + r
    else {
      // RFC 3986 §5.2.3: a base with an authority and an EMPTY path
      // merges as "/" + ref (a query-only base like "https://a.com?q"
      // has bPath "" — without the floor the host and ref glue into
      // "a.compage.html")
      val cut = bPath.lastIndexOf('/')
      val dir = if (cut < 0) "/" else bPath.substring(0, cut + 1)
      prefix + removeDotSegments(dir + refPath) + refQuery
    }
  }

  def resolveEval(b: Any, r: Any): UTF8String =
    UTF8String.fromString(resolve(
      b.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString))
}

/** `url_resolve(base string, ref string) -> string` */
case class UrlResolveExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"url_resolve expects (string, string), got $other")
    }
  override def dataType: DataType = StringType
  override def nullSafeEval(b: Any, r: Any): Any =
    UrlResolve.resolveEval(b, r)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, r) =>
      s"${ev.value} = graft.functions.UrlResolve.resolveEval($b, $r);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "url_resolve"
}
