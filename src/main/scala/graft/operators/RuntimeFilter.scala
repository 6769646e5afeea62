package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}

import graft.functions.BloomMightContain

/** Explicit runtime join filtering: build a Bloom filter over the
  * (already filtered) build side's join keys, probe it in the fact scan,
  * keep an exact join downstream to kill the false positives.
  *
  * This is the pattern Spark's `InjectRuntimeFilter` applies when its
  * heuristics line up; making it a first-class operator means a pipeline
  * author can apply it deliberately — e.g. a 100 TB lineitem scan joined
  * to the ~2% of orders matching a predicate: the bloom removes ~98% of
  * fact rows at the scan (before the shuffle), for one extra driver-side
  * aggregate over the SMALL side.
  *
  * Scale notes: `stat.bloomFilter` is a treeAggregate — executors build
  * partial filters, the driver merges; the result is a few MB for
  * millions of keys at 1% fpp (bits ≈ −n·ln(fpp)/ln²2). The bytes ship
  * once per executor inside the serialized plan. Correctness does NOT
  * depend on the bloom (no false negatives + exact join downstream), so
  * `expectedItems` being wrong only costs selectivity, never rows.
  */
object RuntimeFilter {

  /** Build a serialized Bloom filter of `build`'s `key` column (bigint). */
  def bloomFor(
      build: DataFrame,
      key: String,
      expectedItems: Long = 1L << 20,
      fpp: Double = 0.01): Array[Byte] =
    BloomMightContain.serialize(build.stat.bloomFilter(key, expectedItems, fpp))

  /** Probe: keep fact rows whose key might be in the filter. */
  def prefilter(fact: DataFrame, key: Column, bloomBytes: Array[Byte]): DataFrame =
    fact.filter(GraftBridge.column(
      BloomMightContain(GraftBridge.expression(key), bloomBytes)))
}
