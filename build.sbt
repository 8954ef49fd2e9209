ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flodspark"
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
)

// ---- parallel test groups (VERDICT r18 #2) ----
// A sequential `sbt test` run is ~46 min of wall clock (76 suites, one
// shared local[4] session), which overflows the driver's test window —
// VERIFY_r18 recorded tests_ok:false with every suite green on disk.
// Suites are LPT-packed into N forked JVMs that run CONCURRENTLY; each
// group owns its JVM (own SparkContext, own scratch tempdirs) and its
// own spark.sql.warehouse.dir so bucketed-table writes (q65 family)
// never collide across groups. Weights are measured suite seconds
// (target/test-reports at r19 HEAD); unlisted suites default small —
// exact weights only shape the packing, never correctness.
val testGroupCount = 6
val suiteWeights: Map[String, Int] = Map(
  "graft.ops.ScaleLawSpec" -> 470,
  "graft.PlanSpec" -> 280,
  "graft.QueriesSpecShard0" -> 180,
  "graft.QueriesSpecShard1" -> 180,
  "graft.QueriesSpecShard2" -> 180,
  "graft.LayoutInvarianceSpec" -> 169,
  "graft.ops.CondTreeSubstrateSpec" -> 104,
  "graft.ops.StatsSpec" -> 68,
  "graft.ops.Batch26Spec" -> 67,
  "graft.ops.ComponentsSpec" -> 52,
  "graft.ops.Batch27Spec" -> 46,
  "graft.ops.HdbscanSpec" -> 39,
  "graft.ops.OrderStatsSpec" -> 36,
  "graft.ops.DataSelectSpec" -> 36,
  "graft.ops.CurationShareSpec" -> 34,
  "graft.stream.StreamingSpec" -> 30,
  "graft.text.DistributedSplitSpec" -> 29,
  "graft.core.CombinatorialSpec" -> 26,
  "graft.ops.Batch21Spec" -> 21,
  "graft.ops.Batch23Spec" -> 16,
  "graft.ops.Batch25Spec" -> 16,
  "graft.ops.TrainPrepSpec" -> 15,
)
Test / testGrouping := {
  val defined = (Test / definedTests).value
  val baseOpts = (Test / javaOptions).value
  // deterministic LPT: heaviest first, each into the lightest group
  val bins = Array.fill(testGroupCount)(
    (scala.collection.mutable.ListBuffer.empty[sbt.TestDefinition], 0L))
  defined.sortBy(t => (-suiteWeights.getOrElse(t.name, 10), t.name))
    .foreach { t =>
      val i = bins.zipWithIndex.minBy { case ((_, w), idx) => (w, idx) }._2
      bins(i)._1 += t
      bins(i) = (bins(i)._1, bins(i)._2 + suiteWeights.getOrElse(t.name, 10))
    }
  bins.zipWithIndex.collect { case ((ts, _), i) if ts.nonEmpty =>
    Tests.Group(
      s"g$i",
      ts.toVector,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(
        baseOpts.toVector :+
          s"-Dspark.sql.warehouse.dir=${(target.value / s"test-wh-g$i").toURI}")))
  }.toVector
}
// the default restriction caps concurrent forked test groups at 1;
// lift it to the group count (each JVM runs local[4] — 6 × 4 threads
// on 32 cores)
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount))
