package graft.gen

import java.io.{BufferedWriter, File, FileWriter}
import java.time.{Instant, LocalDate, ZoneOffset}
import java.util.UUID
import scala.util.Random

import graft.schema.RawEvent

/** Deterministic raw-event generator — the Scala counterpart of the
  * reference's seeded, fault-injecting sample-data generators
  * (ref: data/sample_raw/generate_events.py, add_late_events.py).
  *
  * Same shape and rates: 4 event types weighted .25/.45/.20/.10, 500
  * users, `amount` only on purchases (uniform 5–200, 2 decimals), ~2%
  * null user_id, ~1% duplicate event_id with ts shifted +1..120 s
  * (ref: generate_events.py:14-16,35-55,67-75). Per-date seeding keeps
  * each partition reproducible (Python's salted hash() made the original
  * byte-stream non-reproducible — FIXTURES.md §A.1 — so this port fixes
  * its own documented seed derivation: seed*31 + date.hashCode).
  */
object EventsGen {

  val EventTypes: Vector[String] =
    Vector("login", "view_item", "add_to_cart", "purchase")
  private val Weights = Vector(0.25, 0.45, 0.20, 0.10)
  private val CumWeights = Weights.scanLeft(0.0)(_ + _).tail

  def generateDay(
      ingestionDate: String,
      nEvents: Int = 1000,
      missingUserRate: Double = 0.02,
      duplicateEventRate: Double = 0.01,
      seed: Long = 42L): Seq[RawEvent] = {
    val rnd = new Random(seed * 31 + ingestionDate.hashCode)
    val dayStart = LocalDate.parse(ingestionDate)
      .atStartOfDay(ZoneOffset.UTC).toInstant

    val events = Vector.tabulate(nEvents) { _ =>
      val eventType = pickWeighted(rnd)
      val ts = dayStart.plusSeconds(rnd.nextInt(86400).toLong)
      val userId =
        if (rnd.nextDouble() < missingUserRate) None
        else Some((rnd.nextInt(500) + 1).toString)
      val amount =
        if (eventType == "purchase")
          Some(math.rint(rnd.between(5.0, 200.0) * 100) / 100)
        else None
      RawEvent(
        event_id = new UUID(rnd.nextLong(), rnd.nextLong()).toString,
        user_id = userId,
        event_type = eventType,
        event_ts = isoTs(ts),
        amount = amount)
    }

    // duplicate injection: same event_id, ts shifted +1..120 s
    val nDupes = math.max(1, (nEvents * duplicateEventRate).toInt)
    val dupes = Vector.fill(nDupes) {
      val orig = events(rnd.nextInt(events.length))
      orig.copy(event_ts =
        isoTs(Instant.parse(orig.event_ts)
          .plusSeconds(rnd.nextInt(120).toLong + 1)))
    }
    events ++ dupes
  }

  /** Late-arrival batch (ref: add_late_events.py:10-18): extra rows for an
    * existing date, restricted event-type mix, distinct seed. */
  def generateLate(ingestionDate: String, nEvents: Int = 50,
      seed: Long = 123L): Seq[RawEvent] = {
    val rnd = new Random(seed * 31 + ingestionDate.hashCode)
    val dayStart = LocalDate.parse(ingestionDate)
      .atStartOfDay(ZoneOffset.UTC).toInstant
    val types = Vector("view_item", "add_to_cart", "purchase")
    Vector.fill(nEvents) {
      val eventType = types(rnd.nextInt(types.length))
      RawEvent(
        event_id = new UUID(rnd.nextLong(), rnd.nextLong()).toString,
        user_id = Some((rnd.nextInt(500) + 1).toString),
        event_type = eventType,
        event_ts = isoTs(dayStart.plusSeconds(rnd.nextInt(86400).toLong)),
        amount = if (eventType == "purchase")
          Some(math.rint(rnd.between(5.0, 200.0) * 100) / 100) else None)
    }
  }

  /** NDJSON writer — one JSON object per line, raw-zone layout
    * `<base>/ingestion_date=<d>/<file>` (ref: generate_events.py:79-83,
    * upload_to_s3.sh:6-13). */
  def writeNdjson(events: Seq[RawEvent], rawBase: String,
      ingestionDate: String, fileName: String = "events.json"): File = {
    val dir = new File(s"${rawBase.stripSuffix("/")}/ingestion_date=$ingestionDate")
    dir.mkdirs()
    val out = new File(dir, fileName)
    val w = new BufferedWriter(new FileWriter(out))
    try events.foreach { e => w.write(toJsonLine(e)); w.newLine() }
    finally w.close()
    out
  }

  private[gen] def toJsonLine(e: RawEvent): String = {
    def s(v: String) =
      if (v == null) "null"
      else "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    // Locale.ROOT: the f-interpolator honors the JVM default locale, and
    // a comma-decimal locale would emit malformed JSON ("amount": 42,0)
    val amount = e.amount.map { a =>
      if (a == math.rint(a))
        String.format(java.util.Locale.ROOT, "%.1f", Double.box(a))
      else a.toString
    }.getOrElse("null")
    s"""{"event_id": ${s(e.event_id)}, "user_id": ${e.user_id.map(s).getOrElse("null")}, "event_type": ${s(e.event_type)}, "event_ts": ${s(e.event_ts)}, "amount": $amount}"""
  }

  private def pickWeighted(rnd: Random): String = {
    val r = rnd.nextDouble()
    EventTypes(CumWeights.indexWhere(r < _) match {
      case -1 => EventTypes.length - 1
      case i => i
    })
  }

  private def isoTs(i: Instant): String = i.toString // ISO-8601 ...Z
}
