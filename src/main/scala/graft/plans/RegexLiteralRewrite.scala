package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Contains, Literal, RLike, StringTranslate}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: a case-insensitive UNANCHORED regex whose term
  * carries no metacharacters IS a substring test — rewrite
  * `col RLIKE '(?i).*term.*'` to a substring probe over an
  * ASCII-folded subject.
  *
  * Why it matters: the reference's partial-search endpoint emits
  * exactly this pattern for every user query (app/api/main.py:157-160
  * builds `{"$regex": ".*term.*", "$options": "i"}`), so a ported
  * workload scans with a regex engine per row where a codegen'd
  * substring probe would do. The rewrite fires only when the captured
  * term is ASCII alphanumerics/space/safe punctuation — anything that
  * could change regex semantics keeps the original RLike.
  *
  * The fold uses `translate(subject, 'A..Z', 'a..z')`, NOT `lower()`:
  * Java's `(?i)` is ASCII-only case folding, while `lower()` is full
  * Unicode — e.g. lower('İ') = "i̇" CONTAINS 'i', so a
  * lower()-based rewrite would return extra rows on non-ASCII data.
  * translate touches exactly the 26 ASCII letters, matching the regex
  * engine's fold on the guarded term alphabet.
  *
  * Registered via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`) — the SURVEY §2 extension ladder's
  * Rule[LogicalPlan] tier, next to the Expression tier
  * (VectorExpressions/LaneSums) and the aggregate tier (TopKPairs).
  */
object RegexLiteralRewrite extends Rule[LogicalPlan] {

  // (?i).*TERM.* with TERM free of regex metacharacters (ASCII-only,
  // no dot/star/class/anchor/escape — conservative allowlist)
  private val Shape = """^\(\?i\)\.\*([A-Za-z0-9 _,;:-]+)\.\*$""".r

  private val upperAscii = ('A' to 'Z').mkString
  private val lowerAscii = ('a' to 'z').mkString

  private def literalTerm(pattern: String): Option[String] =
    pattern match {
      case Shape(term) => Some(term)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case RLike(subject, Literal(p: UTF8String, StringType))
          if literalTerm(p.toString).isDefined =>
        Contains(
          StringTranslate(subject,
            Literal(UTF8String.fromString(upperAscii), StringType),
            Literal(UTF8String.fromString(lowerAscii), StringType)),
          Literal(UTF8String.fromString(
            literalTerm(p.toString).get.toLowerCase(java.util.Locale.ROOT)),
            StringType))
    }
}
