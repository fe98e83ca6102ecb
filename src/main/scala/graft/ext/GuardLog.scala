package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Execution-time guard logging for lazily-constructed plans.
  *
  * An operator that must WARN when a data-dependent guard fires (e.g.
  * the basket-pairs mega-basket cap dropping degenerate baskets) has
  * two bad options: count eagerly at query-construction time — every
  * plan-only consumer (lint, explain, dry-run) then pays a
  * corpus-scale job and the warning fires before any data flows
  * (ADVICE r14) — or stay silent. This is the third option: the
  * operator attaches a `Dataset.observe` metric (a CollectMetrics
  * node — zero extra jobs, the count rides the rows already flowing
  * through the plan) under a `graft_guard_*` name and calls
  * [[ensure]]; a session-registered [[QueryExecutionListener]] then
  * logs any nonzero guard count WHEN THE QUERY ACTUALLY EXECUTES.
  * Construction stays plan-only, the guard stays loud, and the
  * warning carries the real executed count.
  *
  * The listener is registered at most once per session (identity-
  * keyed — sessions in this library are few and long-lived). Guard
  * firings are also recorded in [[lastFired]] so specs can assert the
  * path without scraping logs; the listener bus is asynchronous, so
  * spec assertions poll.
  */
object GuardLog {

  /** Observation-name prefix the listener reacts to; the suffix names
    * the guarding operator. The observed row's FIRST column must be
    * the fired-count long. */
  val Prefix = "graft_guard_"

  // Keyed on the SESSION OBJECT via a weak set, not its identity
  // hash (ADVICE r15): identity hashes are not unique and outlive
  // GC'd sessions, so a hash reuse would silently skip registration
  // and drop guard warnings with no signal. The weak keys let dead
  // sessions fall out instead of pinning them.
  private val installed = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  private val fired = new java.util.concurrent.atomic.AtomicReference(
    Map.empty[String, Long])

  /** Most recent nonzero count per guard name (spec hook; listener
    * delivery is async — poll with a deadline). */
  def lastFired: Map[String, Long] = fired.get()

  private val listener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (rawName, row) =>
        if (rawName.startsWith(Prefix) && !row.isNullAt(0)) {
          // a '#'-suffixed name (graft_guard_df_cap#17) is a
          // UNIQUIFIED instance of the base guard: Spark requires
          // observation names to be distinct per query, so operators
          // that can appear several times in one fused plan (the
          // lazy df-cap) append a per-call counter; the ledger key
          // stays the base name so specs and the stress gate read
          // every instance through one surface
          val name = rawName.split('#')(0)
          val n = row.getLong(0)
          if (n > 0) {
            // CAS loop: listener buses from multiple sessions deliver
            // concurrently, and a plain read-modify-write on a
            // volatile Map loses entries under that race (ADVICE r15)
            fired.updateAndGet(m => m + (name -> n))
            org.slf4j.LoggerFactory.getLogger("graft.ext.GuardLog")
              .warn(s"$name: guard fired on $n rows " +
                "(see the registering operator's scaladoc)")
          }
        }
      }
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = ()
  }

  /** Idempotently register the guard listener on this session. */
  def ensure(s: SparkSession): Unit =
    if (installed.add(s)) s.listenerManager.register(listener)

  private val nameSeq = new java.util.concurrent.atomic.AtomicLong

  /** A per-call-unique observation name for guard `base`: Spark
    * rejects two DIFFERENT CollectMetrics nodes sharing one name in a
    * query, and a fused plan (the curation chains) can contain the
    * same guarding operator several times. The listener strips the
    * '#'-suffix, so the guard ledger still reads `Prefix + base`. */
  def uniqueName(base: String): String =
    Prefix + base + "#" + nameSeq.incrementAndGet()

  /** Record an EAGERLY-counted guard firing (the [[Dedup.hotKeys]]
    * df-cap counts at staging time, not through an observe metric) so
    * specs and the stress gate read every guard through one surface. */
  def record(name: String, n: Long): Unit =
    if (n > 0) fired.updateAndGet(m => m + ((Prefix + name) -> n))
}
