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
  // GC choice is HEAP-DEPENDENT, so it is opt-in, never a blanket default.
  // ParallelGC won the PINNED scaling bench (fixed 8 GiB heap, taskset, HOF
  // hot paths since replaced by typed mapPartitions) — but under an unpinned
  // local[32] harness its full-GC behavior stalls the whole JVM long enough
  // to blow Spark's 10 s RPC/heartbeat timeouts (observed: pipeline_e2e
  // 160 s -> 390 s under the round-2 driver run with ParallelGC forced on).
  // Default = G1 (JVM default, pause-bounded at any heap size); the scaling
  // script sets SPARK_GRAFT_GC=parallel explicitly alongside its pinned
  // heap, keeping the collector identical at every parallelism level there.
  sys.env.get("SPARK_GRAFT_GC").filter(_ == "parallel")
    .map(_ => Seq("-XX:+UseParallelGC")).toSeq.flatten
