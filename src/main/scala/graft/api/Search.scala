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

  /** Insolar MinTimePulse — smallest valid pulse number. */
  val MinTimePulse = 65536L

  sealed trait Target
  final case class PulseTarget(pulse: Long) extends Target
  final case class JetDropTarget(jetId: String, pulse: Long) extends Target
  final case class LifelineTarget(objectRef: Array[Byte]) extends Target
  final case class RecordTarget(recordRef: Array[Byte]) extends Target
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
    val trimmed = value.trim
    if (trimmed.isEmpty) return NoMatch
    // numeric → pulse
    if (trimmed.forall(_.isDigit) && trimmed.length <= 18) {
      val p = trimmed.toLong
      return if (p >= MinTimePulse) PulseTarget(p) else NoMatch
    }
    // "<jet>:<pulse>" → jet drop
    Codecs.parseJetDropId(trimmed) match {
      case Some((jet, pulse)) if pulse >= MinTimePulse => return JetDropTarget(jet, pulse)
      case Some(_) => return NoMatch
      case None => ()
    }
    // base58 reference → object / record
    Codecs.parseReference(trimmed) match {
      case Some(bytes) => classifyReference(bytes)
      case None => NoMatch
    }
  }
}
