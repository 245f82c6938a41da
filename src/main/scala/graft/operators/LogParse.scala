package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Raw-log-line parsing (SURVEY §2.1 S13 full form; templates/app.py:
 * 1028-1144 `/get_logs`): extract a timestamp from each line using the
 * reference's two regex shapes — `YYYY-MM-DD HH:MM:SS` anywhere in the
 * line, falling back to a `[ ... ]`-bracketed variant — keep lines newer
 * than `since`, sort by time, return the last `limit`.
 *
 * Normalizations (documented, deliberate): lines with no parseable
 * timestamp are dropped (the reference keeps them only in the
 * wall-clock-dependent `since == 0` initial-load branch), and ties on the
 * truncated-to-seconds timestamp break by line text descending (the
 * reference relies on Python sort stability, which is not a semantic).
 */
object LogParse {

  /** Reference main pattern (templates/app.py:1074). */
  val TsRe = "(\\d{4}-\\d{2}-\\d{2}\\s+\\d{2}:\\d{2}:\\d{2})"
  /** Reference bracketed fallback (templates/app.py:1092). */
  val AltRe = "\\[([\\d-]+\\s+[\\d:]+)\\]"

  def parse(lines: DataFrame, lineCol: String, sinceEpoch: Long,
            limit: Int = 200): DataFrame = {
    // r6: both regexes fused into one native byte scan (gf.log_ts) — same
    // leftmost-match/priority semantics (LogTsSpec pins equality against
    // the regexp_extract pair), one pass instead of two Pattern executions
    // per line
    val tsStr = graft.functions.gf.log_ts(col(lineCol))
    lines
      // try_to_timestamp: a regex match that is digit-shaped but not a real
      // timestamp ('[9999-99-99 99:99:99]') must drop the LINE, not crash
      // the job — under ANSI mode to_timestamp throws on unparseable input,
      // while the reference try/excepts and skips (templates/app.py:1074-
      // 1101); the null falls out at the epoch > since predicate.
      .withColumn("epoch",
        unix_timestamp(try_to_timestamp(tsStr, lit("yyyy-MM-dd HH:mm:ss"))))
      .where(col("epoch") > sinceEpoch)
      .orderBy(desc("epoch"), desc(lineCol))
      .limit(limit)
      .select(col("epoch"), col(lineCol).as("line"))
  }
}
