package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data preparation operators (north-star extension): the
  * steps between a curated corpus and a tokenizer-ready dataset.
  *
  * All are pure column/window expressions — deterministic, shuffle
  * bounded, oracle-checkable in a second engine:
  *  - [[splitAssign]]: stable train/val assignment from an id hash (no
  *    RNG state, reproducible across runs and engines, survives corpus
  *    append since each id's split never changes).
  *  - [[normalized]]: canonical text form for formatting-insensitive
  *    exact dedup (case/punctuation/whitespace collapsed).
  *  - [[packedBin]]: greedy concat-packing of documents into
  *    token-budget bins per shard — the standard pretraining packing;
  *    partitioned by a shard key so the cumulative sum parallelizes
  *    (one global ordered window would serialize at 100 TB).
  *  - [[chunkStarts]]: overlapping fixed-size character chunks for
  *    embedding/retrieval pipelines (explode at the call site).
  */
object TrainingPrep {

  /** Lehmer / Park–Miller minimal-standard multiplier and modulus:
    * h(id) = (id · 48271) mod (2^31 − 1) mixes sequential ids well and
    * the product stays far below 2^63 for any realistic id space
    * (overflow-safe up to id ≈ 1.9e14 even under ANSI mode — a
    * multiplicative constant near 2^31 would overflow at id ≈ 3.5e9 and
    * either throw or silently skew the split). */
  val HashA = 48271L
  val HashM = 2147483647L

  /** Uniform pseudo-random bucket in [0, m) from an id — the shared
    * primitive for every deterministic sampling decision here. `pmod`
    * keeps the bucket nonnegative for NEGATIVE ids too — `%` preserves
    * sign in both Spark and DuckDB, so a signed `%` would collapse all
    * negative ids into the low buckets. Pure integer arithmetic,
    * identical in DuckDB, stable under corpus append. */
  def hashBucket(id: Column, m: Int): Column =
    pmod(pmod(id * HashA, lit(HashM)), lit(m))

  /** 'train' for trainPct% of ids, 'val' otherwise — deterministic,
    * engine-portable, stable under corpus append: an id's split never
    * changes. */
  def splitAssign(id: Column, trainPct: Int): Column =
    when(hashBucket(id, 100) < trainPct, "train").otherwise("val")

  /** Keep-decision for balancing a skewed corpus down to `cap` docs per
    * group: keep ≈ cap/groupN of each group, exactly all of a group
    * already at or under the cap (bucket·groupN < cap·1e6 is always
    * true when groupN ≤ cap). Pure integer compare — no floating-point
    * rate, so Spark and DuckDB agree bit-for-bit — and entirely
    * MAP-SIDE given a per-row group size: the scale path for "uniform
    * source mixture" downsampling at 100 TB, where a rank-per-group
    * window would shuffle the full corpus into per-group sorts. */
  def balancedKeep(id: Column, groupN: Column, cap: Long): Column =
    hashBucket(id, 1000000) * groupN < lit(cap) * 1000000L

  /** Repeat count for fractional-epoch upsampling (pretraining data
    * mixes: "see this source 2.5×"): `milliEpochs` is the weight in
    * thousandths (2500 = 2.5 epochs), every doc repeats floor(w) times
    * and a deterministic w-fractional share of docs repeat once more —
    * integer arithmetic only, so the oracle reproduces it exactly. */
  def epochRepeat(milliEpochs: Column, id: Column): Column =
    floor(milliEpochs / 1000).cast("long") +
      when(hashBucket(id, 1000) < milliEpochs % 1000, 1L).otherwise(0L)

  /** Canonical text: lowercase, collapse every non-alphanumeric run
    * (punctuation AND whitespace — including newlines/tabs, so
    * line-wrapped variants of the same text canonicalize identically)
    * to a single space, trim — catches formatting-only duplicates that
    * byte-exact dedup misses. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Bin index for greedy concat-packing: documents ordered by
    * `orderCol` within each `shard` are concatenated and cut every
    * `budget` tokens; a document's bin is the budget-multiple its first
    * token falls in. One partitioned window sum — no driver loop. */
  def packedBin(tokens: Column, shard: Column, orderCol: Column, budget: Int): Column = {
    val cumBefore =
      sum(tokens).over(Window.partitionBy(shard).orderBy(orderCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - tokens
    floor(cumBefore / budget).cast("long")
  }

  /** Array of chunk start offsets (0, stride, 2·stride, … < length) —
    * `posexplode` + `substr` at the call site turns it into overlapping
    * chunks of `size` chars with `size - stride` overlap. Empty/null
    * text yields an empty array (zero chunks), matching the oracle's
    * `range(0, ceil(len/stride))` row count. */
  def chunkStarts(text: Column, stride: Int): Column =
    when(length(text) > 0,
      sequence(lit(0), length(text) - 1, lit(stride)))
      .otherwise(array().cast("array<int>"))
}
