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

  /** Percent-encode the characters that would break the tcp DSN's
    * `?k=v&k=v` parameter syntax. Deliberately NOT java.net.URLEncoder:
    * its '+'-for-space convention would corrupt any existing password
    * containing a literal '+' on the decode side. */
  def pctEncode(v: String): String =
    v.flatMap {
      case '%' => "%25"
      case '&' => "%26"
      case '=' => "%3D"
      case '?' => "%3F"
      case '/' => "%2F" // keeps the db path segment unambiguous
      case ' ' => "%20"
      case c => c.toString
    }

  /** Inverse of [[pctEncode]]: decodes only %XX sequences ('+' stays
    * a literal '+'). */
  def pctDecode(v: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < v.length) {
      if (v.charAt(i) == '%' && i + 3 <= v.length)
        try {
          sb.append(Integer.parseInt(v.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } catch { case _: NumberFormatException => sb.append(v.charAt(i)); i += 1 }
      else { sb.append(v.charAt(i)); i += 1 }
    }
    sb.result()
  }

  /** Assemble a `tcp:` DSN from secret-style options; None when no
    * connection part is present. An explicit `dsn` option should be
    * preferred by callers — this is the fallback merge. The output is
    * the form the repo's transports actually open
    * (`tcp:host:port/db?user=u&password=pw&sslmode=m`); a previous
    * revision emitted libpq keyword/value syntax that no transport
    * parsed, so every secret-style attach failed — with the cleartext
    * password embedded in the rejection message. */
  def assemble(options: Map[String, String]): Option[String] = {
    def opt(name: String): Option[String] =
      options.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    val host = opt("host")
    if (host.isEmpty) None
    else {
      val port = opt("port").getOrElse("5432")
      // the db segment is pct-encoded too: a database name containing
      // '?', '/' or '&' (all legal in PG) must not be parsed as the
      // path/param separators on the decode side (fromDsn pct-decodes)
      val db = pctEncode(opt("database").orElse(opt("dbname"))
        .orElse(opt("user")).getOrElse("postgres"))
      // an IPv6 host literal contains ':' — bracket it (RFC 3986 form)
      // so fromDsn's host:port split stays unambiguous
      val h = host.get
      val hostSeg = if (h.contains(':') && !h.startsWith("[")) s"[$h]" else h
      val params = Seq(
        opt("user").map(v => s"user=${pctEncode(v)}"),
        opt("password").map(v => s"password=${pctEncode(v)}"),
        opt("sslmode").map(v => s"sslmode=${pctEncode(v)}"),
        opt("sslrootcert").map(v => s"sslrootcert=${pctEncode(v)}")).flatten
      val query = if (params.isEmpty) "" else params.mkString("?", "&", "")
      Some(s"tcp:$hostSeg:$port/$db$query")
    }
  }

  /** Redact the password for logs/error messages/table names
    * (ref: secret redaction, src/postgres_extension.cpp:96-103).
    * The unquoted branch stops at '&' and whitespace so the
    * parameters AFTER password= in a tcp DSN (sslmode, sslrootcert —
    * exactly what an operator debugging TLS needs) survive. */
  def redact(dsn: String): String =
    dsn.replaceAll("(?i)(password=)(?:'(?:\\\\.|[^'])*'|[^&\\s]+)", "$1********")
}
