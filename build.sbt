ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "claims_dataspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
scalacOptions += "-deprecation"
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
  // 8g default. A 24g default was tried mid-r14 on the theory that the
  // 337-query catalog's tail ran under GC pressure; controlled fresh-JVM
  // re-measures reversed it (BENCH_NOTES_r14.md "heap size experiment"):
  // on this host G1 at >=16g heap shows erratic multi-second young-gen
  // evacuation pauses and 2-10x pass-time blowups on allocation-heavy
  // queries (q185: 8g -> ~9 s steady; 16g -> 66-198 s; 24g -> 21-84 s),
  // while at 8g every measured query converges to its historical band.
  // SPARK_DRIVER_MEM still overrides for bigger/smaller hosts.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
