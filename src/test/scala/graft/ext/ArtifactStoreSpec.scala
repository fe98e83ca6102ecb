package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persistent artifact store's contract (VERDICT r17 #1): the
  * build-once discipline must survive the JVM boundary. A FRESH
  * session over the same corpus snapshot ATTACHES to the persisted
  * artifacts — zero build jobs, zero schema-inference jobs, values
  * identical to the building session — and a CHANGED snapshot can
  * never serve the old artifact (the file-listing fingerprint is part
  * of every key). */
class ArtifactStoreSpec extends SparkSpec {

  private val tmpRoot = java.nio.file.Files
    .createTempDirectory("graft_store_spec").toString
  Scratch.reclaimOnExit(tmpRoot)

  private def session(): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.graft.artifactRoot", tmpRoot)
    s
  }

  /** AnnServingPathSpec's probe, widened to the store's call sites:
    * count only jobs from this thread's job group whose stage call
    * sites name the staging/serving code path. */
  private def jobsDuring[A](f: => A): (A, Int) = {
    val gid = s"store-probe-${System.nanoTime()}"
    val sites = Seq("PairStage.scala", "ArtifactStore.scala",
      "Tables.scala", "Similarity.scala", "Dedup.scala",
      "ExtQueriesSimilarity.scala", "ExtQueriesDedup.scala",
      "Materialize.scala", "ArtifactStoreSpec.scala")
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (js.properties != null &&
          gid == js.properties.getProperty("spark.jobGroup.id") &&
          js.stageInfos.exists(si => sites.exists(si.name.contains))) {
          n.incrementAndGet(); ()
        }
      }
    }
    spark.sparkContext.addSparkListener(l)
    spark.sparkContext.setJobGroup(gid, "artifact-store attach probe")
    try {
      val r = f
      Thread.sleep(1000) // listener bus is async
      (r, n.get())
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(l)
    }
  }

  private def serving(s: SparkSession, name: String): DataFrame =
    graft.registry.ExtQueries.queries(name)(s, sf0001)

  test("a fresh session serves the staged families with zero build jobs, values identical") {
    val s1 = session()
    // session 1 BUILDS (fresh store root)
    val built = Seq("sim_ivf_topk", "dedup_simhash").map { q =>
      q -> serving(s1, q).collect().map(_.toString).sorted.toSeq
    }.toMap
    assert(built.values.forall(_.nonEmpty))
    // simulate a new JVM over the same persisted root: drop every
    // in-JVM memo for this root (attached artifacts AND the card
    // scalars ride the same memo), then attach from a fresh session
    ArtifactStore.resetMemosForTest(tmpRoot)
    val s2 = session()
    for (q <- Seq("sim_ivf_topk", "dedup_simhash")) {
      // construction after a cold attach must trigger ZERO jobs from
      // the staging/serving path: manifest validation is a driver-side
      // metadata read, schemas and card scalars ride the manifest.
      // min over three attempts — see AnnServingPathSpec on why a
      // sibling suite's broadcast jobs can rarely inherit our group.
      val attempts = (1 to 3).map { _ => jobsDuring(serving(s2, q)) }
      val jobs = attempts.map(_._2).min
      assert(jobs == 0,
        s"$q construction in a FRESH session over a persisted store " +
          s"triggered $jobs build jobs on every attempt — attach must " +
          "be a manifest read, not a rebuild")
      val got = attempts.head._1.collect().map(_.toString).sorted.toSeq
      assert(got == built(q),
        s"$q attach/build divergence across sessions")
    }
  }

  test("a changed snapshot rebuilds: the store can never serve stale rows") {
    val s = session()
    val dir = java.nio.file.Files.createTempDirectory("graft_store_snap").toString
    Scratch.reclaimOnExit(dir)
    val docs1 = Seq((1L, "alpha beta gamma delta alpha beta gamma"),
      (2L, "alpha beta gamma delta alpha beta gamma"),
      (3L, "zeta eta theta iota kappa lambda mu"))
    import s.implicits._
    docs1.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val p1 = PairStage.lshPairs(s, dir).collect().toSeq
    assert(p1.nonEmpty, "dup docs 1-2 must pair")
    // regenerate the snapshot: doc 3 now duplicates doc 1 too
    val docs2 = docs1.take(2) :+
      ((3L, "alpha beta gamma delta alpha beta gamma"))
    docs2.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val p2 = PairStage.lshPairs(s, dir).collect().toSeq
    assert(p2.size > p1.size,
      s"regenerated snapshot served ${p2.size} pairs (was ${p1.size}) — " +
        "the store is keyed by a stale fingerprint")
  }

  test("manifest frame carries provenance for every persisted artifact") {
    val s = session()
    PairStage.corpusCard(s, sf0001) // ensure at least the card exists
    val m = ArtifactStore.manifest(s)
    assert(m.columns.toSet == Set("artifact", "tag", "version",
      "built_unix_ms", "build_wall_ms", "last_attach_unix_ms",
      "inputs", "parts", "n_scalars"))
    val rows = m.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("version") == ArtifactStore.codeVersion))
    assert(rows.forall(_.getAs[Long]("built_unix_ms") > 0L))
    // liveness (GC input) is at least the build instant
    assert(rows.forall(r => r.getAs[Long]("last_attach_unix_ms") >=
      r.getAs[Long]("built_unix_ms") - 1000L))
    val card = rows.find(_.getAs[String]("tag") == "card")
    assert(card.exists(_.getAs[Int]("n_scalars") == 2),
      s"card manifest must carry (n, max_norm_sq): ${rows.mkString(";")}")
    assert(card.exists(_.getAs[String]("inputs")
      .contains("embeddings.parquet@")))
  }

  test("sweep reclaims only artifacts older than the cutoff; consumers rebuild") {
    val s = spark.newSession()
    val root = java.nio.file.Files
      .createTempDirectory("graft_store_gc").toString
    Scratch.reclaimOnExit(root)
    s.conf.set("spark.graft.artifactRoot", root)
    PairStage.corpusCard(s, sf0001)
    assert(ArtifactStore.manifest(s).count() == 1L)
    // younger than any sane cutoff: survives
    assert(ArtifactStore.sweep(s, maxAgeMs = 3600L * 1000) == 0)
    assert(ArtifactStore.manifest(s).count() == 1L)
    // cutoff in the past: swept, memo evicted, next call REBUILDS
    // (same values — the snapshot is unchanged)
    val before = PairStage.corpusCard(s, sf0001)
    assert(ArtifactStore.sweep(s, maxAgeMs = -1L) == 1)
    assert(ArtifactStore.manifest(s).count() == 0L)
    assert(PairStage.corpusCard(s, sf0001) == before)
    assert(ArtifactStore.manifest(s).count() == 1L)
  }

  test("local-FS rename onto an existing dir nests the source — the hazard the commit protocol repairs") {
    // Hadoop's RawLocalFileSystem falls back to FileUtil.copy when
    // File.renameTo fails, and checkDest redirects an
    // existing-directory destination to dest/<srcName> while still
    // returning TRUE — a race loser would nest its scratch inside the
    // winner's committed artifact. The store's commit protocol skips
    // the rename when dest exists and repairs a nested landing; this
    // pins the hazard itself so a future Hadoop semantics change is
    // noticed.
    import org.apache.hadoop.fs.Path
    val base = java.nio.file.Files.createTempDirectory("graft_rename_pin")
    Scratch.reclaimOnExit(base.toString)
    val fs = new Path(base.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val a = new Path(base.toString, "src_dir")
    val b = new Path(base.toString, "dest_dir")
    fs.mkdirs(a); fs.mkdirs(b)
    fs.create(new Path(a, "part-0")).close()
    fs.create(new Path(b, "part-0")).close()
    val r = fs.rename(a, b)
    assert(!r || fs.exists(new Path(b, a.getName)),
      "rename onto an existing dir neither failed nor nested — " +
        "the commit protocol's hazard model no longer matches Hadoop")
  }

  test("an empty commit (manifest without data files) is evicted and rebuilt, never served") {
    // the on-disk shape left when a commit-wait attacher reclaims a
    // stalled writer's data and the writer's manifest lands after
    // (review r19): a validating manifest over a dir with zero data
    // files. Both the attach path and the post-commit data check must
    // refuse to serve it — an attach here would return empty frames
    // with no error, forever.
    import org.apache.hadoop.fs.Path
    val s1 = session()
    val want = serving(s1, "dedup_simhash")
      .collect().map(_.toString).sorted.toSeq
    assert(want.nonEmpty)
    val fs = new Path(tmpRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    var stripped = 0
    fs.listStatus(new Path(tmpRoot)).foreach { st =>
      if (st.isDirectory && !st.getPath.getName.startsWith(".")) {
        fs.listStatus(st.getPath).foreach { c =>
          if (!c.getPath.getName.startsWith("_")) {
            fs.delete(c.getPath, true); stripped += 1
          }
        }
      }
    }
    assert(stripped > 0, "fixture must strip real data files")
    ArtifactStore.resetMemosForTest(tmpRoot)
    val s2 = session()
    val got = serving(s2, "dedup_simhash")
      .collect().map(_.toString).sorted.toSeq
    assert(got == want,
      "an empty commit must be evicted and rebuilt, not served as 0 rows")
  }

  test("sweep reclaims hour-dead uncommitted wrecks, spares write-recent ones") {
    // a writer that crashed between its data rename and the manifest
    // commit leaves a manifest-less dir in the store ROOT; only a
    // same-key re-request would reclaim it, and keys embed snapshot
    // fingerprints — a retired key's wreck would leak forever unless
    // sweep takes it (review r19). The same rule as crashed .building
    // scratch: no write activity for an hour.
    import org.apache.hadoop.fs.Path
    val s = session()
    val fs = new Path(tmpRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val wreck = new Path(s"$tmpRoot/graft_wrecktest_${System.nanoTime()}")
    fs.mkdirs(wreck)
    fs.create(new Path(wreck, "part-00000"), true).close()
    val old = System.currentTimeMillis() - 2 * 3600L * 1000
    assert(new java.io.File(s"${wreck.toUri.getPath}/part-00000")
      .setLastModified(old))
    assert(new java.io.File(wreck.toUri.getPath).setLastModified(old))
    val fresh = new Path(s"$tmpRoot/graft_freshtest_${System.nanoTime()}")
    fs.mkdirs(fresh)
    fs.create(new Path(fresh, "part-00000"), true).close()
    ArtifactStore.sweep(s, maxAgeMs = 14L * 24 * 3600 * 1000)
    assert(!fs.exists(wreck),
      "hour-dead uncommitted wreck must be reclaimed by sweep")
    assert(fs.exists(fresh),
      "write-recent uncommitted dir is an in-flight commit — spared")
    fs.delete(fresh, true)
  }

  test("corpus card over an empty slice fails loudly, not with an NPE") {
    val s = session()
    val dir = java.nio.file.Files.createTempDirectory("graft_store_empty").toString
    Scratch.reclaimOnExit(dir)
    import s.implicits._
    Seq.empty[(Long, Array[Double])].toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalStateException] {
      PairStage.corpusCard(s, dir)
    }
    assert(e.getMessage.contains("empty"), e.getMessage)
  }
}
