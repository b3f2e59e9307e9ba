package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension installer — the deployment entry point promised by
  * SURVEY §7.1 pillar 3:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects every custom codegen'd expression (minhash/simhash/shingle/band
  * hashing, vector dot product) into the session's function registry at
  * build time, so SQL text can call them without any driver-side
  * `ensure()` call. The in-process query surface still calls the cached
  * `HashFunctions.ensure`/`VecFunctions.ensure` (idempotent either way);
  * this class exists so a cluster deployment gets the functions in every
  * session — including Thrift-server/Connect sessions the library never
  * touches directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.HashFunctions.injectInto(ext)
    graft.functions.VecFunctions.injectInto(ext)
    // the full graft dialect (SET @var, SHOW VARIABLES, PREPARE/EXECUTE,
    // UPSERT, OPTIMIZE, CREATE SOURCE) at every SQL entry point — incl.
    // Thrift/JDBC sessions, which fork with these extensions applied
    ext.injectParser((session, delegate) =>
      new graft.engine.GraftParser(session, delegate))
  }
}
