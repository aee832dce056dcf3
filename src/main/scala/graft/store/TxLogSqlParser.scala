package graft.store

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StructType}

/** Statement-level MERGE for [[MergeWriter]] stores — the `MERGE INTO`
  * SQL surface (reference upsert semantics
  * `db/access/db_result_storage.py:73-107`), paired with the
  * view-based time travel in [[TxLogSql.pinView]] so a SQL-only
  * consumer can both write and read-pinned without touching the Scala
  * API. Executes as a [[LeafRunnableCommand]] — driver-side commit
  * protocol, distributed batch write — and returns the committed
  * version as a one-row result, the natural input to a follow-up
  * `pinView` at exactly that snapshot.
  */
final case class MergeIntoTxLogCommand(storePath: String,
                                       keys: Seq[String],
                                       batchId: Long,
                                       source: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    // a bare identifier is a view/table reference; anything else must be
    // a QUERY: parseQuery rejects commands/DDL up front, so `USING
    // INSERT INTO ...` can never run as a side effect of the merge
    // (spark.sql executes commands EAGERLY — without this gate an
    // arbitrary statement placed in USING would execute with session
    // privileges and the merge would then commit the command's empty
    // output as a junk batch). After the gate, spark.sql on the same
    // text is lazy (it is a query), and graft SQL functions resolve
    // as in any session query.
    val src =
      if (source.matches("""[A-Za-z_][A-Za-z0-9_.]*""")) spark.table(source)
      else {
        spark.sessionState.sqlParser.parseQuery(source)
        spark.sql(source)
      }
    val version = new MergeWriter(spark, storePath, keys).upsert(src, batchId)
    Seq(Row(version))
  }
}

/** Pin a store snapshot under a temp view from SQL — `VERSION AS OF`
  * without a Scala call ([[TxLogSql.pinView]] is the API flavor).
  * Returns the pinned version, so `PIN ... AS v` + `SELECT ... FROM v`
  * is a complete SQL-only time-travel read.
  */
final case class PinTxLogViewCommand(storePath: String,
                                     keys: Seq[String],
                                     view: String,
                                     version: Option[Long])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val v = version.getOrElse {
      val cur = new MergeWriter(spark, storePath, keys).txLog.currentVersion()
      require(cur >= 0, s"store at $storePath has no committed version to pin")
      cur
    }
    TxLogSql.pinView(spark, view, storePath, keys, v)
    Seq(Row(v))
  }
}

private[store] object TxLogSqlPaths {
  /** The MERGE/PIN statements address a [[MergeWriter]] STORE root (the
    * log lives under `<path>/table`), while the raw-table maintenance
    * statements address a TxLog table root directly. Accepting only one
    * flavor per statement made `VACUUM TXLOG '<storeRoot>'` a silent
    * no-op (empty log dir at the store root), so the maintenance
    * commands resolve the root: the path itself if it carries a commit
    * log, else its `/table` child if THAT carries one — and otherwise
    * fail loudly instead of reporting success over a log that was never
    * there.
    */
  def resolveTableRoot(path: String): String = {
    def hasLog(p: String) = new java.io.File(p, "_log").isDirectory
    if (hasLog(path)) path
    else if (hasLog(s"$path/table")) s"$path/table"
    else throw new IllegalArgumentException(
      s"no TxLog commit log at '$path' or '$path/table' — nothing to maintain")
  }
}

/** Expire table history from SQL — the `VACUUM` statement analog over
  * a raw TxLog table root ([[TxLog.vacuum]] is the API flavor; same
  * retention contract: keep the last `keepVersions` manifests plus
  * everything younger than `retainMs`, reclaim only unreferenced data
  * older than the `orphanGraceMs` staging-protection window). Accepts
  * either a raw table root or a [[MergeWriter]] store root (resolved
  * via [[TxLogSqlPaths.resolveTableRoot]]). Returns the number of
  * manifest versions still retained after the vacuum.
  */
final case class VacuumTxLogCommand(tableRoot: String,
                                    keepVersions: Int,
                                    retainMs: Long,
                                    orphanGraceMs: Long)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("retained_versions", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val log = new TxLog(TxLogSqlPaths.resolveTableRoot(tableRoot))
    log.vacuum(keepVersions, orphanGraceMs = orphanGraceMs,
      retainMs = retainMs)
    // a manifest-listing count, not history(): the vacuum already
    // succeeded, so reporting it must neither re-parse every retained
    // manifest nor fail on an unparseable legacy one
    Seq(Row(log.versionCount().toLong))
  }
}

/** Small-files compaction from SQL. With a KEYS clause the target is a
  * [[MergeWriter]] store and compaction collapses upsert history under
  * last-writer-wins ([[MergeWriter.compact]]), skipped while the
  * history holds fewer than `minEntries` manifest entries; without KEYS
  * the target is a raw hidden-partitioned table root (or a store root,
  * resolved via [[TxLogSqlPaths.resolveTableRoot]]) and compaction
  * rewrites only partitions holding >= `minEntries` live entries
  * ([[TxLog.compactPartitions]]). `keepVersions` governs post-compaction
  * retention exactly as in the API (0 = skip the vacuum, caller owns
  * retention). Returns the table's current version after the call.
  */
final case class CompactTxLogCommand(path: String,
                                     keys: Seq[String],
                                     keepVersions: Int,
                                     minEntries: Int)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val log =
      if (keys.nonEmpty) {
        // keyed statements address the STORE root (log under
        // `<path>/table`); validate before constructing the writer so a
        // wrong path fails loudly instead of no-op "compacting" an
        // empty store it just implied into existence
        if (!new java.io.File(s"$path/table", "_log").isDirectory) {
          val hint =
            if (new java.io.File(path, "_log").isDirectory)
              " ('" + path + "' is a raw TABLE root — keyed COMPACT takes " +
                "the MergeWriter STORE root, its parent)"
            else ""
          throw new IllegalArgumentException(
            s"no MergeWriter store at '$path' (expected a commit log at " +
              s"'$path/table/_log')$hint")
        }
        val w = new MergeWriter(spark, path, keys)
        w.compact(keepVersions = keepVersions, minEntries = minEntries)
        w.txLog
      } else {
        val l = new TxLog(TxLogSqlPaths.resolveTableRoot(path))
        l.compactPartitions(spark, minEntries = minEntries,
          keepVersions = keepVersions): Unit
        l
      }
    Seq(Row(log.currentVersion()))
  }
}

/** Commit history of a raw TxLog table root from SQL — the
  * `DESCRIBE HISTORY` analog ([[TxLogSql.history]] is the API flavor).
  */
final case class DescribeTxLogCommand(tableRoot: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("op", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("n_entries", org.apache.spark.sql.types.IntegerType,
      nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = true)())

  override def run(spark: SparkSession): Seq[Row] =
    new TxLog(TxLogSqlPaths.resolveTableRoot(tableRoot)).history()
      .map { case (v, op, n, rows) =>
        Row(v, op, n, rows.map(java.lang.Long.valueOf).orNull)
      }
}

/** Delegating session parser injected by [[graft.GraftExtensions]]:
  * recognizes exactly five extra statements,
  *
  * {{{
  *   MERGE INTO TXLOG '<storePath>' KEYS (k1, k2) BATCH <n> USING <source>
  *   PIN TXLOG '<storePath>' KEYS (k1, k2) AS <view> [VERSION AS OF <n>]
  *   DESCRIBE TXLOG '<tableRoot>'
  *   VACUUM TXLOG '<tableRoot>' [KEEP <n> VERSIONS] [RETAIN <m> MINUTES]
  *                              [GRACE <s> SECONDS]
  *   COMPACT TXLOG '<path>' [KEYS (k1, k2)] [MIN <n> ENTRIES]
  *                          [KEEP <n> VERSIONS]
  * }}}
  *
  * where `<source>` is a view name or any SELECT (the rest of the
  * statement text — last clause by construction, so no nested-paren
  * grammar is needed). Together they make a [[MergeWriter]] store fully
  * drivable from SQL alone: upsert (returns the committed version), pin
  * any retained version as a queryable view, inspect the commit log,
  * and run the two maintenance operations (history expiry, small-files
  * compaction). Every other string goes verbatim to the delegate, so the
  * injection can never change the semantics of standard SQL. This is
  * the Catalyst-idiomatic shape Delta/Iceberg use for their statement
  * extensions: a thin `ParserInterface` wrapper, not a fork of the
  * grammar.
  */
final class TxLogSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val mergePat =
    """(?is)MERGE\s+INTO\s+TXLOG\s+'([^']+)'\s+KEYS\s*\(([^)]+)\)\s+BATCH\s+(\d+)\s+USING\s+(.+?)\s*;?\s*""".r
  private val pinPat =
    """(?is)PIN\s+TXLOG\s+'([^']+)'\s+KEYS\s*\(([^)]+)\)\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""".r
  private val describePat =
    """(?is)DESCRIBE\s+TXLOG\s+'([^']+)'\s*;?\s*""".r
  private val vacuumPat =
    """(?is)VACUUM\s+TXLOG\s+'([^']+)'(?:\s+KEEP\s+(\d+)\s+VERSIONS)?(?:\s+RETAIN\s+(\d+)\s+MINUTES)?(?:\s+GRACE\s+(\d+)\s+SECONDS)?\s*;?\s*""".r
  private val compactPat =
    """(?is)COMPACT\s+TXLOG\s+'([^']+)'(?:\s+KEYS\s*\(([^)]+)\))?(?:\s+MIN\s+(\d+)\s+ENTRIES)?(?:\s+KEEP\s+(\d+)\s+VERSIONS)?\s*;?\s*""".r

  /** Leading whitespace, `--` line comments and (unnested) bracketed
    * comments removed before recognition — real SQL lexers strip these,
    * so a commented `MERGE INTO TXLOG` must still match. Only the
    * RECOGNITION input is stripped: a non-matching statement goes to
    * the delegate byte-for-byte (an unterminated or nested comment
    * simply fails to match here and fails in the delegate as ordinary
    * SQL would).
    */
  @scala.annotation.tailrec
  private def stripLeadingComments(s: String): String = {
    val t = s.dropWhile(_.isWhitespace)
    if (t.startsWith("--"))
      stripLeadingComments(t.dropWhile(c => c != '\n' && c != '\r'))
    else if (t.startsWith("/*")) {
      val end = t.indexOf("*/", 2)
      if (end < 0) t else stripLeadingComments(t.substring(end + 2))
    } else t
  }

  private def unquote(k: String): String =
    if (k.length > 1 && k.startsWith("`") && k.endsWith("`"))
      k.substring(1, k.length - 1)
    else k

  private def keyList(keys: String, stmt: String): Seq[String] = {
    val ks = keys.split(",").map(k => unquote(k.trim))
      .filter(_.nonEmpty).toSeq
    require(ks.nonEmpty, s"$stmt needs at least one key column")
    ks
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    stripLeadingComments(sqlText) match {
      case mergePat(path, keys, batch, source) =>
        MergeIntoTxLogCommand(path, keyList(keys, "MERGE INTO TXLOG"),
          batch.toLong, source)
      case pinPat(path, keys, view, version) =>
        PinTxLogViewCommand(path, keyList(keys, "PIN TXLOG"), view,
          Option(version).map(_.toLong))
      case describePat(root) =>
        DescribeTxLogCommand(root)
      case vacuumPat(root, keep, retainMin, graceSec) =>
        VacuumTxLogCommand(root,
          keepVersions = Option(keep).map(_.toInt).getOrElse(1),
          retainMs = Option(retainMin).map(_.toLong * 60000L).getOrElse(0L),
          orphanGraceMs =
            Option(graceSec).map(_.toLong * 1000L).getOrElse(600000L))
      case compactPat(path, keys, minE, keep) =>
        CompactTxLogCommand(path,
          keys = Option(keys).map(k => keyList(k, "COMPACT TXLOG"))
            .getOrElse(Nil),
          keepVersions = Option(keep).map(_.toInt).getOrElse(1),
          minEntries = Option(minE).map(_.toInt).getOrElse(2))
      case _ => delegate.parsePlan(sqlText)
    }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
