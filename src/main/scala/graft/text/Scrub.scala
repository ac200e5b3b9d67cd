package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing: regex redaction of emails / IPv4 addresses / phone
  * numbers, the standard pre-training hygiene pass.
  *
  * Pure narrow `regexp_replace` chain — fuses into the scan, no
  * shuffle, codegen'd. The patterns deliberately stay inside the
  * common Java-regex / RE2 subset (no backreferences, no lookaround,
  * greedy quantifiers only) so the transform is reproducible by any
  * RE2-based engine — which is also what makes it oracle-checkable.
  * Order matters: emails first (their local part contains digits),
  * then IPs (dotted digits would otherwise half-match as phones),
  * then phones.
  */
object Scrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhoneRe = "\\+?[0-9][0-9 ()-]{6,}[0-9]"

  def redactEmails(text: Column): Column = regexp_replace(text, EmailRe, "<EMAIL>")
  def redactIps(text: Column): Column = regexp_replace(text, Ipv4Re, "<IP>")
  def redactPhones(text: Column): Column = regexp_replace(text, PhoneRe, "<PHONE>")

  /** Full hygiene pass, in dependency order. */
  def redact(text: Column): Column = redactPhones(redactIps(redactEmails(text)))

  /** Redaction counts (post-hoc, for audit tables). */
  def redactionCount(scrubbed: Column, marker: String): Column =
    size(regexp_extract_all(scrubbed, lit(java.util.regex.Pattern.quote(marker)), lit(0)))
}
