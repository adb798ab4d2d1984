package graft.api

import graft.functions.Codecs

/** J7 — polymorphic search dispatch (reference: `api/handlers.go:458-553`).
  *
  * A search value resolves, in order, to:
  *  - a pulse number (numeric, >= MinTimePulse),
  *  - a jet drop id (`"<jet>:<pulse>"`, root rendered `"*"`),
  *  - a base58 insolar reference — classified as an object lifeline or a
  *    single record by the 36-byte layout's type prefix.
  *
  * Pure driver-side classification; the matched branch then runs the
  * corresponding point query (P4/J8) which Catalyst prunes to a partition.
  */
object Search {

  /** Insolar MinTimePulse — smallest valid pulse number (1 << 16; the
    * first 65536 numbers are reserved for the system).
    */
  val MinTimePulse = 65536L

  /** Largest valid time pulse: pulse numbers are uint32 with the top two
    * bits reserved for special pulses, so MaxTimePulse = 2^30 - 1 (the
    * public insolar `pulse` package's bound behind
    * `pulse.IsValidAsPulseNumber`, `api/handlers.go:494`).
    */
  val MaxTimePulse = (1L << 30) - 1

  /** `pulse.IsValidAsPulseNumber` — the validity check every pulse-valued
    * query param runs through (`api/handlers.go:299-308`).
    */
  def isValidPulse(p: Long): Boolean = p >= MinTimePulse && p <= MaxTimePulse

  sealed trait Target
  final case class PulseTarget(pulse: Long) extends Target
  final case class JetDropTarget(jetId: String, pulse: Long) extends Target
  final case class LifelineTarget(objectRef: Array[Byte]) extends Target
  final case class RecordTarget(recordRef: Array[Byte]) extends Target

  /** The value parsed as an integer but is not a valid pulse number — its
    * own 400 ("not valid pulse number", `api/handlers.go:494-506`),
    * distinct from [[NoMatch]]'s "is neither ...".
    */
  final case class InvalidPulse(value: Long) extends Target
  case object NoMatch extends Target

  /** Reference layout: 36 bytes; a SELF-scoped reference (object) has its
    * 4-byte scope prefix zeroed, a record reference embeds a non-zero
    * scope. We mirror the object-vs-record split on the first 4 bytes.
    */
  private def classifyReference(bytes: Array[Byte]): Target =
    if (bytes.length != 36) NoMatch
    else if (bytes.take(4).forall(_ == 0)) LifelineTarget(bytes)
    else RecordTarget(bytes)

  def dispatch(value: String): Target = {
    if (value.isEmpty) return NoMatch
    // integer (ParseInt semantics: optional sign, int64 range, NO
    // whitespace tolerance — strconv.ParseInt(" 70000") errors) → the
    // pulse branch, valid or not (`api/handlers.go:460-464`); an
    // overflowing or padded digit string falls through like ParseInt's
    // error does
    value.toLongOption match {
      case Some(p) => return if (isValidPulse(p)) PulseTarget(p) else InvalidPulse(p)
      case None => ()
    }
    // "<jet>:<pulse>" → jet drop; NewJetDropIDFromString puts no validity
    // bound on the pulse part (`etl/models/models.go:94-113`), so neither
    // do we
    Codecs.parseJetDropId(value) match {
      case Some((jet, pulse)) => return JetDropTarget(jet, pulse)
      case None => ()
    }
    // base58 reference → object / record
    Codecs.parseReference(value) match {
      case Some(bytes) => classifyReference(bytes)
      case None => NoMatch
    }
  }
}
