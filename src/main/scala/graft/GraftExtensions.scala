package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension injector — the zero-code deployment path for the
  * engine (SURVEY §2.10 extension surface):
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects every engine expression (`graft_polyhash`, `cass_render`,
  * `cass_sort_key`, the sketch/LSH family, hex casters) into the
  * session's function registry at build time, so plain
  * `spark.sql("SELECT graft_polyhash(text, 31) ...")` works with no
  * imports. The two DSv2 sources (`sstable`, `aegjson`) need no
  * injection — they resolve by short name through the standard
  * `DataSourceRegister` service loader.
  *
  * The builder list is shared with the per-session
  * [[graft.functions.CassFunctions.registerAll]] path (used by library
  * code), so the two registration routes cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    graft.functions.CassFunctions.builders.foreach { case (name, builder) =>
      extensions.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    // opt-in optimizer rule: inequality (range) joins become bucketed
    // equi-joins when spark.graft.rangeJoin.bucketWidth is set — see
    // graft.plans.RangeJoinRewrite
    extensions.injectOptimizerRule(graft.plans.RangeJoinRewrite)
  }
}
