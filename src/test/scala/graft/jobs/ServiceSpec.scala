package graft.jobs

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkSpec

class ServiceSpec extends SparkSpec {
  test("service loop: bounded iterations, jobs serialized, errors contained") {
    val work = Files.createTempDirectory("graft-svc")
    val in = work.resolve("in")
    val f = "application_server_status/partition=1/application_server_status+1+0000000018+0000000020.avro"
    Files.createDirectories(in.resolve(f).getParent)
    Files.copy(Paths.get("/root/reference/src/integrationTest/resources").resolve(f),
      in.resolve(f), StandardCopyOption.REPLACE_EXISTING)
    val cfg = RestructureJobConfig(inputRoot = in.toString,
      outputRoot = work.resolve("out").toString)
    Service.runLoop(spark, cfg,
      Service.ServiceConfig(intervalMs = 10, cleanerEnabled = true,
        cleanerAgeMs = Long.MaxValue, maxIterations = Some(2)))
    assert(Files.exists(work.resolve(
      "out/STAGING_PROJECT/1543bc93-3c17-4381-89a5-c5d6272b827c/application_server_status/20200128_1300.csv")))
    // an unreadable config must not throw out of the loop
    Service.runLoop(spark,
      cfg.copy(outputRoot = "/dev/null/impossible"),
      Service.ServiceConfig(intervalMs = 1, maxIterations = Some(1)))
  }
}
