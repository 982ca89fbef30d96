package graft.meta

/** DSN assembly + redaction — the Spark shape of the reference's
  * `CREATE SECRET (TYPE postgres, ...)` handling: secret parts are
  * merged into the connection string at attach and the password is
  * redacted wherever the DSN is shown (ref:
  * src/postgres_extension.cpp:76-112, src/postgres_storage.cpp:26-98).
  *
  * In Spark the secret store is the catalog conf / Hadoop credential
  * provider: `spark.sql.catalog.pg.host/port/user/password/database`
  * (or an explicit `dsn`, which wins). Values are escaped per libpq
  * keyword/value quoting rules.
  */
object PgDsn {

  private val parts: Seq[(String, String)] = Seq(
    "host" -> "host", "port" -> "port", "user" -> "user",
    "password" -> "password", "database" -> "dbname", "dbname" -> "dbname")

  /** libpq keyword/value escaping: quote when empty or containing
    * spaces/quotes; backslash-escape ' and \. */
  private def libpqValue(v: String): String =
    if (v.nonEmpty && !v.exists(c => c.isWhitespace || c == '\'' || c == '\\')) v
    else "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Assemble a keyword/value DSN from secret-style options; None when
    * no connection part is present. An explicit `dsn` option should be
    * preferred by callers — this is the fallback merge. */
  def assemble(options: Map[String, String]): Option[String] = {
    val found = parts.flatMap { case (opt, kw) =>
      options.collectFirst {
        case (k, v) if k.equalsIgnoreCase(opt) => kw -> v
      }
    }.distinctBy(_._1)
    if (found.isEmpty) None
    else Some(found.map { case (k, v) => s"$k=${libpqValue(v)}" }.mkString(" "))
  }

  /** Redact the password for logs/error messages/table names
    * (ref: secret redaction, src/postgres_extension.cpp:96-103). */
  def redact(dsn: String): String =
    dsn.replaceAll("(?i)(password=)(?:'(?:\\\\.|[^'])*'|\\S+)", "$1********")
}
