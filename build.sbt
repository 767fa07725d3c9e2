ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "virtuosoquadlogspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++
  // Pin the heap (and optionally pre-touch) for benchmark stability: heap
  // growth causes serialized kernel page-fault storms that poison scaling
  // measurements on many-core VMs.
  sys.env.get("SPARK_GRAFT_XMS")
    .map(m => Seq(s"-Xms$m", "-XX:+AlwaysPreTouch")).toSeq.flatten ++
  // Scaling-bench honesty knob: local[N] caps task slots at N but the JVM
  // still sizes GC/JIT/common pools to ALL host cores, which silently
  // donates the idle cores to the "small" configuration. Pinning the
  // visible processor count emulates a genuine N-core executor.
  sys.env.get("SPARK_GRAFT_PROC_COUNT")
    .map(n => Seq(s"-XX:ActiveProcessorCount=$n")).toSeq.flatten ++
  // Batch pipelines allocate hard; ParallelGC trades pause time for
  // throughput. Measured: at local[32] G1's allocation machinery throttled
  // the extraction stage ~2.5x (21.2s vs 7.1s) even with near-zero GC
  // pause time, so ParallelGC is the DEFAULT (same collector at every
  // parallelism level — scaling comparisons stay honest). SPARK_GRAFT_GC=g1
  // opts back into G1.
  (if (sys.env.get("SPARK_GRAFT_GC").contains("g1")) Seq.empty
   else Seq("-XX:+UseParallelGC"))
