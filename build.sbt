ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kaminparspark"
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
// Forked `run` output passes straight through to stdout, UNPREFIXED — the bench
// harness's JSON result line must be machine-parseable (an sbt [info] prefix breaks
// the driver's parser; see Bench.scala, which also writes bench.json).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // Codegen cache (static conf, default 100 entries): the iterative operators emit
  // hundreds of distinct whole-stage-codegen units per run, and the bench's three
  // deterministic partition repetitions replay IDENTICAL generated code — at 100
  // entries the cache evicts everything between reps and Janino recompiles ~0.3-1 s
  // per stage (measured via thread dumps: 31 of 32 task threads parked on the
  // compile cache lock). 8192 entries keeps every plan of a bench run resident;
  // cost is driver memory for compiled classes only, scale-independent.
  "-Dspark.sql.codegen.cache.maxEntries=8192",
  // r06 measured A/B (medians of full bench runs at sf0.1/local[32]): 16g heap
  // stabilizes the 32-task-slot local driver (8g left ~4.6 GiB storage+execution
  // for 32 concurrent tasks; the partition rep spread shrank and total dropped
  // ~8%), and the throughput collector fits a batch bench with no latency SLA
  // (total 93.8 -> 90.4). Both are JVM-level settings, not query-shape settings —
  // cluster deployments size executor memory independently of this local default.
  // (spark.sql.join.preferSortMergeJoin=false was A/B'd too and REGRESSED the
  // coarsen stage 10.5 -> 15.3 s; rejected.)
  "-XX:+UseParallelGC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
// measurement hook: extra JVM/system-property flags for A/B experiments
// (e.g. GC choice, spark.* conf defaults) without editing the build per run
javaOptions ++= sys.env.get("GRAFT_EXTRA_JVM_OPTS")
  .map(_.trim.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
