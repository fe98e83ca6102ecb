package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/** The artifact store's cross-process contracts, exercised with REAL
  * OS processes (VERDICT r18 #1: the rename-race repair was spec'd by
  * simulating the nested landing; the sweep-vs-live-attach hazard had
  * no multi-JVM evidence at all), plus the r19 protocol specs: the
  * manifest-LAST commit's wait-then-reclaim window, sweep aging on
  * max(build, last attach), the fingerprint staleness bound
  * (`spark.graft.artifactFpTtlMs`), root-relative fingerprint
  * entries, and the injective key encoding. */
class ArtifactStoreRaceSpec extends SparkSpec {

  private def session(root: String): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.graft.artifactRoot", root)
    s
  }

  private def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    Scratch.reclaimOnExit(d)
    d
  }

  private def hfs(path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeDocs(dir: String, n: Int): Unit = {
    val s = spark
    import s.implicits._
    (1 to n).map(i => (i.toLong, s"doc $i " + ("token " * (i % 7 + 1))))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
  }

  /** Launch `graft.tools.StoreRace` in a separate JVM with the same
    * classes dir this suite runs against. Returns (process, output
    * file). */
  private def launch(args: Seq[String]): (Process, java.io.File) = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val classes = new java.io.File(ArtifactStore.getClass
      .getProtectionDomain.getCodeSource.getLocation.toURI).getAbsolutePath
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val out = java.io.File.createTempFile("store_race", ".out")
    out.deleteOnExit()
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g",
      "-cp", s"$classes:/opt/spark/jars/*",
      "graft.tools.StoreRace") ++ args)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(out)
    (pb.start(), out)
  }

  private def slurp(f: java.io.File): String =
    new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)

  /** The store writes manifests through Hadoop's checksummed local
    * FS, which keeps a `.crc` sidecar — any RAW manifest surgery the
    * spec does must drop the sidecar or later store reads fail with
    * ChecksumException instead of exercising the protocol. */
  private def dropCrc(artifactDir: String): Unit = {
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(artifactDir, "._graft_manifest.json.crc"))
    ()
  }

  private def rawWriteManifest(artifactDir: String, bytes: Array[Byte]): Unit = {
    java.nio.file.Files.write(
      java.nio.file.Paths.get(artifactDir, "_graft_manifest.json"), bytes)
    dropCrc(artifactDir)
  }

  private def rawDeleteManifest(artifactDir: String): Unit = {
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(artifactDir, "_graft_manifest.json"))
    dropCrc(artifactDir)
  }

  /** Rewrite an artifact's manifest `built_unix_ms` in place (the
    * spec's time machine — sweep trusts the manifest's build time). */
  private def backdateManifest(artifactDir: String, toMs: Long): Unit = {
    val p = java.nio.file.Paths.get(artifactDir, "_graft_manifest.json")
    val json = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    val re = "\"built_unix_ms\":\\s*\\d+".r
    assert(re.findFirstIn(json).isDefined, s"no built_unix_ms in $json")
    rawWriteManifest(artifactDir,
      re.replaceFirstIn(json, s""""built_unix_ms": $toMs""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def backdateAttachMarker(artifactDir: String, toMs: Long): Unit = {
    val fs = hfs(artifactDir)
    fs.setTimes(new Path(artifactDir, "_graft_last_attach"), toMs, -1)
  }

  private def artifactDirs(root: String): Seq[java.io.File] =
    new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("graft_")).toSeq

  test("two OS processes racing the same build key: one committed artifact, identical rows, no nesting") {
    val root = tmpDir("graft_race_root")
    val fixture = tmpDir("graft_race_fix")
    writeDocs(fixture, 500)
    val (pa, outA) = launch(Seq("build", root, fixture, "a", "1500"))
    val (pb, outB) = launch(Seq("build", root, fixture, "b", "1500"))
    // start gun: wait for both processes at the barrier, then fire,
    // so both hit staged() for the same key together
    val t0 = System.currentTimeMillis()
    while (!(new java.io.File(root, "ready_a").exists() &&
             new java.io.File(root, "ready_b").exists())) {
      assert(System.currentTimeMillis() - t0 < 120000L,
        s"racers never reached the barrier:\nA: ${slurp(outA)}\nB: ${slurp(outB)}")
      Thread.sleep(50L)
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "go"), Array.empty[Byte])
    assert(pa.waitFor(180, java.util.concurrent.TimeUnit.SECONDS) &&
      pb.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
      "a racer hung")
    val (sa, sb) = (slurp(outA), slurp(outB))
    assert(pa.exitValue() == 0 && pb.exitValue() == 0,
      s"racer failed.\nA(${pa.exitValue()}): $sa\nB(${pb.exitValue()}): $sb")
    val rows = Seq(sa, sb).map { s =>
      val m = "RACE_OK id=(\\w+) rows=(\\d+) built=(\\d+)".r
        .findFirstMatchIn(s)
      assert(m.isDefined, s"no RACE_OK line in: $s")
      (m.get.group(2).toLong, m.get.group(3).toInt)
    }
    assert(rows.map(_._1) == Seq(500L, 500L),
      s"racers disagree on committed rows: $rows")
    assert(rows.map(_._2).sum >= 1, "nobody built — both claim attach?")
    // exactly ONE committed artifact; its contents are parts + the
    // two underscore markers, never a nested scratch directory
    val dirs = artifactDirs(root)
    assert(dirs.size == 1, s"expected one artifact dir, got $dirs")
    val children = dirs.head.listFiles().toSeq
    assert(children.forall(!_.isDirectory),
      s"nested directory inside committed artifact: $children")
    assert(children.exists(_.getName == "_graft_manifest.json"))
    // the loser's scratch must be gone
    val building = new java.io.File(root, ".building")
    assert(!building.exists() || building.listFiles().isEmpty,
      s"leftover scratch: ${Option(building.listFiles()).map(_.toSeq)}")
    // and a fresh session in THIS JVM attaches to the same values
    val s = session(root)
    val m = ArtifactStore.manifest(s).collect()
    assert(m.length == 1 && m.head.getAs[String]("tag") == "racetest")
    assert(m.head.getAs[String]("version") == ArtifactStore.codeVersion)
  }

  test("sweep races a live attach in another JVM: the attach marker keeps the artifact alive") {
    val root = tmpDir("graft_gc_race_root")
    val fixture = tmpDir("graft_gc_race_fix")
    writeDocs(fixture, 200)
    // build in this JVM, then age the BUILD 100 days into the past
    // (manifest rewrite) and the birth-attach marker with it — only a
    // FRESH attach from the serving process should protect it now
    val s = session(root)
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    graft.tools.StoreRace.racedArtifact(s, fixture, 0L, built)
    assert(built.get() == 1)
    val dir = artifactDirs(root).head.getAbsolutePath
    val old = System.currentTimeMillis() - 100L * 24 * 3600 * 1000
    backdateManifest(dir, old)
    backdateAttachMarker(dir, old)
    val day14 = 14L * 24 * 3600 * 1000
    // serving process: attaches (touching the marker), then read-loops
    val (p, out) = launch(Seq("serve", root, fixture, "4000"))
    // wait until its attach lands (the marker mtime goes fresh)
    val t0 = System.currentTimeMillis()
    while (ArtifactStore.manifest(s).collect()
             .headOption.forall(_.getAs[Long]("last_attach_unix_ms") == old)) {
      assert(System.currentTimeMillis() - t0 < 120000L,
        s"server never attached: ${slurp(out)}")
      Thread.sleep(100L)
    }
    // sweep repeatedly WHILE it serves: the 14-day cutoff is long past
    // the build time but the marker is seconds old — nothing to reap
    (1 to 3).foreach { i =>
      assert(ArtifactStore.sweep(s, day14) == 0,
        s"sweep #$i reclaimed a live-attached artifact")
      Thread.sleep(300L)
    }
    assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS), "server hung")
    val so = slurp(out)
    assert(p.exitValue() == 0 && so.contains("SERVE_OK"),
      s"serving process died mid-read (the pre-r19 hazard): $so")
    // with the server gone and the marker aged out, the same sweep reaps
    backdateAttachMarker(dir, old)
    assert(ArtifactStore.sweep(s, day14) == 1)
    assert(artifactDirs(root).isEmpty)
  }

  test("manifest-last commit: a data-only dir is uncommitted — waited on, then reclaimed; a mid-wait manifest attaches") {
    val root = tmpDir("graft_cwait_root")
    val fixture = tmpDir("graft_cwait_fix")
    writeDocs(fixture, 50)
    val s = session(root)
    s.conf.set("spark.graft.artifactCommitWaitMs", "600")
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    def stage() = graft.tools.StoreRace.racedArtifact(s, fixture, 0L, built)
    val a1 = stage()
    assert(built.get() == 1)
    val manifest = java.nio.file.Paths.get(a1.path, "_graft_manifest.json")
    val saved = java.nio.file.Files.readAllBytes(manifest)
    // crashed writer: data landed, manifest never did -> a fresh
    // consumer must wait out the commit window, reclaim, and REBUILD
    rawDeleteManifest(a1.path)
    ArtifactStore.resetMemosForTest(root)
    val t0 = System.currentTimeMillis()
    val a2 = stage()
    val waited = System.currentTimeMillis() - t0
    assert(built.get() == 2, "data-only dir served without a manifest")
    assert(waited >= 600L, s"reclaimed after ${waited}ms — did not wait out the commit window")
    assert(ArtifactStore.read(s, a2).count() == 50L)
    // winner mid-commit: the manifest lands DURING the wait -> attach,
    // no rebuild
    rawDeleteManifest(a2.path)
    ArtifactStore.resetMemosForTest(root)
    val restorer = new Thread(() => {
      Thread.sleep(250L)
      rawWriteManifest(a2.path, saved)
    })
    restorer.start()
    val a3 = stage()
    restorer.join()
    assert(built.get() == 2, "attacher rebuilt instead of waiting for the winner's manifest")
    assert(ArtifactStore.read(s, a3).count() == 50L)
  }

  test("fingerprint staleness bound: the remote-FS memo honors spark.graft.artifactFpTtlMs; TTL 0 always relists") {
    val s = spark.newSession()
    val dir = tmpDir("graft_fp_ttl")
    def touch(content: String): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "f.parquet"),
        content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    touch("one")
    s.conf.set("spark.graft.artifactFpTtlMs", "60000")
    val f1 = ArtifactStore.fingerprint(s, dir, simulateRemote = true)
    touch("two-longer") // length change: no mtime-granularity flake
    val f2 = ArtifactStore.fingerprint(s, dir, simulateRemote = true)
    assert(f1 == f2,
      "within the TTL the memo must serve — this IS the documented staleness bound")
    s.conf.set("spark.graft.artifactFpTtlMs", "0")
    val f3 = ArtifactStore.fingerprint(s, dir, simulateRemote = true)
    assert(f3 != f1, "TTL 0 must relist on every call")
  }

  test("fingerprint covers root-relative paths: renaming a partition dir changes the snapshot") {
    // Spark derives partition VALUES from directory names — identical
    // files under a renamed `date=` dir are different data
    val s = spark.newSession()
    val dir = tmpDir("graft_fp_rel")
    val sub = java.nio.file.Paths.get(dir, "date=1")
    java.nio.file.Files.createDirectories(sub)
    java.nio.file.Files.write(sub.resolve("part-0.parquet"),
      "payload".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val f1 = ArtifactStore.fingerprint(s, dir)
    assert(java.nio.file.Files.move(sub,
      java.nio.file.Paths.get(dir, "date=3")) != null)
    val f2 = ArtifactStore.fingerprint(s, dir)
    assert(f1 != f2,
      "renamed partition dir kept the fingerprint — base-name-only folding")
  }

  test("key encoding is injective: params Seq(\"a|b\") and Seq(\"a\",\"b\") are different artifacts") {
    val root = tmpDir("graft_inj_root")
    val fixture = tmpDir("graft_inj_fix")
    writeDocs(fixture, 10)
    val s = session(root)
    def stage(params: Seq[Any], value: String) =
      ArtifactStore.staged(s, "inj",
        Seq(s"$fixture/documents.parquet"), params) { scratch =>
        import s.implicits._
        Seq(value).toDF("v").write.mode("overwrite").parquet(scratch)
      }
    val a1 = stage(Seq("a|b"), "one")
    val a2 = stage(Seq("a", "b"), "two")
    assert(a1.path != a2.path,
      "separator-colliding param lists keyed to the same artifact")
    assert(ArtifactStore.read(s, a1).head().getString(0) == "one")
    assert(ArtifactStore.read(s, a2).head().getString(0) == "two")
  }
}
