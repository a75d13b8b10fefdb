package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** Semi-structured (JSON) profiling kernels — ONE shared definition for
  * the batch profiler (q274) and the streaming schema-drift monitor
  * ([[graft.streaming.EventStream.startSchemaDriftMonitor]]), so the
  * two can never disagree about what a "type" is. */
object JsonOps {

  /** Explode a JSON document column to (key, value-text) pairs with ONE
    * parse per row: from_json to map<string,string> renders scalars
    * unquoted and nested objects as compact JSON text. */
  def keyValues(j: Column): Column =
    explode(from_json(j, MapType(StringType, StringType)))

  /** Type class of an unquoted JSON value text —
    * int / float / bool / object / string. The regexes are stated
    * identically in the q274 oracle SQL; values themselves never reach
    * any output, only class counts, so engine-specific number rendering
    * cannot diverge a hash. */
  def typeClass(v: Column): Column =
    when(v.rlike("^-?[0-9]+$"), "int")
      .when(v.rlike("^-?[0-9]+\\.[0-9]+([eE][+-]?[0-9]+)?$"), "float")
      .when(v.isin("true", "false"), "bool")
      .when(v.startsWith("{"), "object")
      .otherwise("string")
}
