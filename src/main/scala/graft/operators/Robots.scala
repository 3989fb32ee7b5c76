package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** robots.txt governance (RFC 9309) — the crawl-compliance operator a
  * Common-Crawl-scale ingest needs beside the WARC source (q117): which
  * of the fetched URLs was the crawler actually allowed to take?
  * Retroactive robots filtering is a standard curation step (Common
  * Crawl itself honors robots at fetch time; pipelines re-apply newer
  * policies at read time).
  *
  * Reference scope: none (the reference ingests a CSV); extension
  * surface of the source/curation families.
  *
  * Two halves, both deliberately simple shapes:
  *
  *   - [[parseRules]]: per-domain robots.txt BODY → one row per
  *     (group, rule). RFC 9309 line grammar: `field: value` with `#`
  *     comments, case-insensitive fields, consecutive `User-agent`
  *     lines opening a group that following Allow/Disallow rules join.
  *     An empty Disallow value is a no-op rule (matches nothing) per
  *     the RFC. Imperative per-row parsing (the WARC/PNG discipline:
  *     real bytes, strict grammar, mapPartitions escape hatch).
  *   - [[evaluate]]: URLs × the matched group's rules, longest-match
  *     decides: the rule whose path pattern matches with the greatest
  *     pattern LENGTH wins; on a tie Allow wins; no match = allowed.
  *     Group selection per URL domain: a group naming the crawler's
  *     product token exactly beats `*`. Patterns support the RFC's `*`
  *     (any octets) and terminal `$` (end anchor) via a compiled
  *     regex; the match itself is per-row compute.
  *
  * Scale shape: the rules table is policy-sized (domains × rules), not
  * corpus-sized — it broadcasts; the per-URL work is one broadcast
  * join keyed on domain + a bounded max-aggregate per URL (rules per
  * domain are dozens). Nothing scales with corpus size but the URL
  * scan itself.
  */
object Robots {

  val ruleSchema: StructType = StructType(Seq(
    StructField("domain", StringType, nullable = false),
    StructField("agent", StringType, nullable = false),
    StructField("allow", BooleanType, nullable = false),
    StructField("path", StringType, nullable = false)))

  /** (domainCol, bodyCol) rows → one row per rule: (domain, agent
    * lowercase, allow, path). Groups with multiple User-agent lines
    * emit their rules once per agent (the RFC's group semantics).
    * Unknown fields and malformed lines are skipped (the RFC requires
    * tolerating extensions); empty-path Disallow rules are dropped
    * (they match nothing).
    */
  def parseRules(df: DataFrame, domainCol: String, bodyCol: String): DataFrame = {
    val enc = RowEncoder.encoderFor(ruleSchema)
    df.select(col(domainCol).cast("string"), col(bodyCol).cast("string"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val domain = r.getString(0)
          val body = if (r.isNullAt(1)) "" else r.getString(1)
          val out = scala.collection.mutable.ArrayBuffer[Row]()
          var agents = List.empty[String]
          var inRules = false
          body.linesIterator.foreach { raw =>
            val line = raw.indexOf('#') match {
              case -1 => raw
              case i => raw.substring(0, i)
            }
            val sep = line.indexOf(':')
            if (sep > 0) {
              val field = line.substring(0, sep).trim.toLowerCase
              val value = line.substring(sep + 1).trim
              field match {
                case "user-agent" =>
                  // a User-agent line after rules STARTS a new group;
                  // consecutive User-agent lines accumulate one group
                  if (inRules) { agents = Nil; inRules = false }
                  agents = value.toLowerCase :: agents
                case "allow" | "disallow" =>
                  inRules = true
                  if (value.nonEmpty)
                    agents.foreach(a => out += Row(domain, a, field == "allow", value))
                case _ => // extensions (sitemap, crawl-delay, ...) skipped
              }
            }
          }
          out
        }
      }(enc)
  }

  /** RFC 9309 pattern → anchored regex: `*` = any octets, terminal `$`
    * = end anchor, everything else literal, implicit prefix match.
    */
  private[operators] def patternRegex(path: String): String = {
    val (body, anchored) =
      if (path.endsWith("$")) (path.dropRight(1), true) else (path, false)
    val sb = new StringBuilder("^")
    body.foreach {
      case '*' => sb.append(".*")
      case c if "\\.[]{}()<>+-=!?^$|".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    if (anchored) sb.append('$') else sb.append(".*")
    sb.toString
  }

  /** Decide every URL against the rules for `agent` (product token,
    * lowercase). Input `urls`: (idCol, domainCol, pathCol). Output:
    * (idCol, domain, path, allowed, rule_len) — rule_len = the winning
    * pattern's length, 0 when no rule matched (allowed by default).
    */
  def evaluate(urls: DataFrame, rules: DataFrame, agent: String,
      idCol: String = "id", domainCol: String = "domain",
      pathCol: String = "path"): DataFrame = {
    val a = agent.toLowerCase
    // group selection per domain: exact product token beats '*'
    val exact = rules.filter(col("agent") === a).select(col("domain")).distinct()
    val chosen = rules.filter(col("agent") === a)
      .unionByName(rules.filter(col("agent") === "*")
        .join(exact, Seq("domain"), "left_anti"))
    // the regex compiles per RULE row on the policy-sized frame (a map
    // over dozens-to-thousands of rules, never over the corpus)
    val compiled = {
      val enc = RowEncoder.encoderFor(StructType(ruleSchema.fields :+
        StructField("rx", StringType, nullable = false)))
      chosen.mapPartitions { rows =>
        rows.map(r => Row(r.getString(0), r.getString(1), r.getBoolean(2),
          r.getString(3), patternRegex(r.getString(3))))
      }(enc)
    }
    val u = urls.select(col(idCol).cast("long").as("uid"),
      col(domainCol).as("domain"), col(pathCol).as("upath"))
    val matched = u.join(broadcast(compiled), Seq("domain"), "left")
      .withColumn("hit", expr("rx IS NOT NULL AND upath RLIKE rx"))
      // winner key: pattern OCTET length * 2 + allow bit — longest match
      // first, Allow wins length ties, so ONE max-aggregate decides.
      // RFC 9309 §2.2.2 specificity is the octet count of the path
      // pattern, so multi-byte UTF-8 characters count per byte, not per
      // codepoint (char length would mis-rank non-ASCII patterns)
      .withColumn("rank",
        when(col("hit"), octet_length(col("path")) * 2 +
          when(col("allow"), 1).otherwise(0)).otherwise(lit(null)))
    matched.groupBy(col("uid"), col("domain"), col("upath"))
      .agg(max(col("rank")).as("best"))
      .select(col("uid").as(idCol), col("domain"), col("upath").as("path"),
        coalesce(col("best") % 2 === 1, lit(true)).as("allowed"),
        coalesce(shiftright(col("best"), 1).cast("long"), lit(0L)).as("rule_len"))
  }
}
