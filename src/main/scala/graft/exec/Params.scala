package graft.exec

import graft.config.Param

/** SQL `{name}` parameter substitution (reference:
  * airflow_etl.py:378-399, which uses Python `str.format`).
  *
  * Semantics kept from Python format: `{name}` placeholders are replaced,
  * `{{`/`}}` escape to literal braces, and an unresolvable placeholder is
  * an error. Unlike the reference (which formats once per parameter and
  * therefore KeyErrors on multi-parameter SQL), all parameters are
  * substituted in a single pass.
  */
object Params {

  final case class MissingParamException(name: String)
    extends RuntimeException(s"SQL placeholder '{$name}' has no bound parameter")

  /** Resolve typed params to string values. ReportDate pulls from the
    * REPORT_DATE variable (reference: airflow_etl.py:389-391).
    */
  def resolve(params: Seq[Param], variables: Map[String, String]): Map[String, String] =
    params.map {
      case Param.ReportDate(name) =>
        name -> variables.getOrElse("REPORT_DATE",
          throw new IllegalStateException("variable REPORT_DATE is not set"))
      case Param.Constant(name, value) => name -> value
    }.toMap

  /** Python-format-style substitution of `{name}` placeholders. */
  def fill(sql: String, values: Map[String, String]): String = {
    val out = new StringBuilder(sql.length + 16)
    var i = 0
    val n = sql.length
    while (i < n) {
      sql.charAt(i) match {
        case '{' if i + 1 < n && sql.charAt(i + 1) == '{' =>
          out.append('{'); i += 2
        case '}' if i + 1 < n && sql.charAt(i + 1) == '}' =>
          out.append('}'); i += 2
        case '{' =>
          val close = sql.indexOf('}', i + 1)
          if (close < 0)
            throw new IllegalArgumentException(s"Unclosed '{' at offset $i in SQL")
          val name = sql.substring(i + 1, close)
          out.append(values.getOrElse(name, throw MissingParamException(name)))
          i = close + 1
        case '}' =>
          throw new IllegalArgumentException(s"Single '}' at offset $i in SQL")
        case c =>
          out.append(c); i += 1
      }
    }
    out.toString
  }

  def fill(sql: String, params: Seq[Param], variables: Map[String, String]): String =
    fill(sql, resolve(params, variables))
}
