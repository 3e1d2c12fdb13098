package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Input-width guard for operators whose dominant cost is PER-ROW
  * compute BEFORE their first exchange (tokenize/hash/decode passes):
  * a small single-file table plans one scan split — parquet cannot
  * split below a row group — so everything downstream of an
  * in-partition expression inherits one task and runs on one core.
  *
  * `wide` hash-repartitions such an input across the session's cores,
  * GATED on the planned scan width: a corpus that already scans wide
  * (the 100 TB case — thousands of splits) passes through untouched,
  * so the corpus-never-shuffles contracts of the wide regime are
  * preserved; only narrow inputs pay the (input-sized, by construction
  * small) exchange, which replaces serial execution of the whole
  * downstream stage. Deterministic hash partitioning (guide §2.5: no
  * rand-derived keys under retries). */
object Spread {
  def wide(df: DataFrame, key: Column): DataFrame = {
    val width = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= width) df
    else df.repartition(width, key)
  }
}
