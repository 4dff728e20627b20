ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "papermergeocrworkerspark"
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
  // Heap sizing (optimization guide §5): local-mode Spark runs all 32
  // executor task slots inside this ONE JVM, so the old fixed 8g default
  // gave ~150 MB of execution memory per concurrent task on a 32-core
  // box and the wide aggregation/sort queries (q69/q74/q105/q107/q109)
  // spilled under memory pressure. Size the heap to HALF the machine's
  // RAM (cgroup-aware, so the same build works on any sandbox size —
  // never a hard-coded -Xmx that could exceed a smaller host), leaving
  // the other half to the OS page cache that serves the parquet scans.
  // SPARK_DRIVER_MEM still overrides with an explicit -Xmx when set.
) ++ (sys.env.get("SPARK_DRIVER_MEM") match {
  case Some(m) => Seq(s"-Xmx$m")
  case None => Seq("-XX:MaxRAMPercentage=50", "-XX:InitialRAMPercentage=25")
}) ++ sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq
  .flatMap(_.trim.split("\\s+").toSeq).filter(_.nonEmpty)
