ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "postgres_scannerspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Emit the forked run's stdout RAW instead of through sbt's logger:
// the logger prefixes every line with "[info] ", and the driver that
// grades Bench keeps a 2000-char stdout tail and parses a one-line
// JSON result from it — a prefixed line fails a plain JSON parse,
// which is consistent with 15 rounds of `parsed: null` in
// BENCH_r01..r15 even when the line itself fit the tail. Verify's
// results ride parquet files + oracle_sql.json, not stdout, so this
// only affects how lines look, never what is computed.
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Size the JIT code cache to the workload (r16, measured): the
  // 264-query battery's generated + library compiled code reaches
  // ~180+ MB, and at the JDK-17 default (ReservedCodeCacheSize=240m,
  // segmented ~119m profiled + ~119m non-profiled) the sweeper
  // continuously FLUSHES cold methods — an entry idle for a few
  // minutes loses its compiled code and its next run burns 3-7x CPU
  // interpreted/C1 until recompilation (no JVM warning is printed for
  // flushing, only for the disabled-compiler case). This was
  // p22_cross_dedup's 4.2<->24s bimodality: five full-battery probe
  // runs, identical plans and shuffle bytes — p22 occurrences
  // 4.9/13.1/11.2 and 5.0/24.0/3.8 at 240m, still 5.4/20.3/9.8 at
  // 512m (the sweeper turns aggressive well below segment capacity),
  // vs 4.4/3.8/4.0 and 5.6/3.4/5.5 at 1g across two 1g runs —
  // stability correlates with 1g in 6/6 occurrences
  // (OPTIMIZATION_r16.md). Reservation is address space, committed
  // grows on demand; any long-running multi-query Spark JVM wants
  // this sized like metaspace. Env-overridable for A/B.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_GRAFT_CODE_CACHE", "1g")}",
  // diagnostics passthrough (empty by default): lets a lab run add
  // JVM flags without editing the build; later flags win, so this can
  // also override the defaults above
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq
  .flatMap(_.split("\\s+").filter(_.nonEmpty))
