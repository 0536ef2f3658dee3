package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational building blocks re-expressing the reference's serving
  * queries (SURVEY.md §2.2–2.7) as declarative DataFrame ops so
  * Catalyst gets full pushdown/pruning/join-selection freedom.
  *
  * Scale notes:
  *  - `topNPerGroup`/`latestPerKey` are window ranks: one shuffle on
  *    the partition keys, no driver materialization, skew handled by
  *    AQE. For top-1 Spark can also use max_by, but row_number keeps
  *    deterministic tie-breaks (required for oracle parity).
  */
object Relational {

  /** Top-N rows per group with a deterministic tie-breaker.
    * Reference: recent-N per user, SURVEY §2.5 W3/W4
    * (db_llm_service.py:144-196). */
  def topNPerGroup(df: DataFrame, partitionCols: Seq[Column],
                   orderCols: Seq[Column], n: Int,
                   rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= n)
  }

  /** Latest row per key (W3: ORDER BY ts DESC LIMIT 1 per user). */
  def latestPerKey(df: DataFrame, keys: Seq[Column],
                   orderCols: Seq[Column]): DataFrame =
    topNPerGroup(df, keys, orderCols, 1).drop("rn")

  /** Bucketed histogram (A5: size-class bucket counts,
    * routes.py:743-747). Buckets are (name, predicate) in priority
    * order; rows failing all predicates get `otherwise`. */
  def bucketize(c: Column, buckets: Seq[(String, Column)],
                otherwise: String): Column =
    buckets.foldRight(lit(otherwise)) { case ((name, pred), acc) =>
      when(pred, lit(name)).otherwise(acc)
    }

  /** Skew-safe equi-join: salt the big side's key deterministically
    * (hash-mod, no rand — reproducible plans) and replicate the small
    * side across the salt range. Use when one key carries a hot spot
    * AQE's skew-join split can't absorb; the result equals the plain
    * inner join. One extra `explode` on the small side, shuffle keys
    * become (key, salt). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Skew join, hot-keys-only refinement of [[saltedJoin]]: salt ONLY
    * the keys that actually carry the skew; cold keys take a constant
    * salt (AQE handles mild residual skew). Uniform salting replicates
    * the small side `saltFactor`× for EVERY key — at 100 TB that
    * multiplies the small side's shuffle for the 99.9% of keys that
    * never needed it. Hot and cold rows share ONE join on (key, salt),
    * so the big side is scanned and shuffled exactly once — the earlier
    * plain∪salted union scanned it twice (round-4 audit: 12 s vs 1.1 s
    * DuckDB at the 100× point). Result equals the plain inner join
    * (spec-asserted).
    *
    * Hot keys come from `hotKeys` when the caller already knows them
    * (table statistics / a prior profiling pass — the production path);
    * otherwise one seeded sample-count job over the big side's key
    * column finds them (column-pruned: reads only `key`).
    *
    * Salting is GATED on measured skew: a sampled key only counts as
    * hot when its sampled frequency is ≥ `skewThreshold` × the mean
    * sampled key frequency AND ≥ `minSampledCount` occurrences. Both
    * bounds are needed: on a near-unique key space (mean ≈ 1), sample
    * noise over millions of keys ALWAYS produces a few keys at 4-6×
    * the mean — five sampled rows is not evidence of partition-scale
    * skew, and without the absolute floor the uniform 100× bench
    * corpus salted eight phantom hot keys. On a uniform corpus the
    * profile therefore comes back empty and the result is the
    * untouched plain join plan — salting is never free (wider shuffle
    * key, small-side replication), so it must not engage without
    * evidence (round-6 audit: uniform-key salted_join ran 6.8× DuckDB
    * for zero benefit).
    *
    * Sample floor: a key is only DETECTABLE when its true frequency
    * is ≳ `minSampledCount / sampleFraction` rows (a few hundred at
    * the defaults) — far below anything that can skew a shuffle
    * partition. Callers profiling corpora where a "hot" key is still
    * rare in absolute terms must raise `sampleFraction` (or pass
    * `hotKeys` from real table statistics) or the gate silently (and
    * harmlessly — the result is identical either way) falls back to
    * the plain join.
    *
    * `broadcastSmall`: when the CALLER knows the small side fits the
    * executor broadcast budget (a filtered dimension, a pre-aggregated
    * key list), the whole skew problem dissolves — a broadcast-hash
    * join never shuffles the big side, so no key can concentrate in
    * one partition and salting would only add a wider key plus
    * small-side replication for zero benefit. The profile/salt
    * machinery is skipped outright; the big side streams through one
    * map-side join. Salting exists for the big⋈big case where BOTH
    * sides must shuffle (r9 audit: the empty-hot-set fallback
    * full-shuffled 60 M rows against a ~3 M-row side that q3_shipping
    * broadcasts — 12.65 s vs 1.69 s for the same-shape equijoin). */
  def skewJoin(big: DataFrame, small: DataFrame, key: String,
               saltFactor: Int, sampleFraction: Double = 0.01,
               hotKeyCount: Int = 16, seed: Long = 42L,
               hotKeys: Option[Seq[Any]] = None,
               skewThreshold: Double = 4.0,
               minSampledCount: Long = 16L,
               broadcastSmall: Boolean = false): DataFrame = {
    if (broadcastSmall) return big.join(broadcast(small), Seq(key))
    val hot = hotKeys.getOrElse {
      val prof = big.sample(withReplacement = false, sampleFraction, seed)
        .groupBy(key).count()
      // two bounded driver results: the mean sampled frequency (one
      // distributed agg) and the gated top-k (distributed TakeOrdered)
      val mean = prof.agg(avg("count")).collect().headOption
        .flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
        .getOrElse(0.0)
      prof.filter(col("count") >= lit(math.max(mean * skewThreshold,
          minSampledCount.toDouble)))
        .orderBy(desc("count"), col(key))
        .limit(hotKeyCount)
        .select(key).collect().map(_.get(0)).toSeq
    }
    if (hot.isEmpty) big.join(small, Seq(key))
    else {
      val saltedBig = big.withColumn("_salt",
        when(col(key).isin(hot: _*),
          pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
          .otherwise(lit(0)))
      val saltedSmall = small.withColumn("_salt",
        explode(when(col(key).isin(hot: _*),
          sequence(lit(0), lit(saltFactor - 1))).otherwise(array(lit(0)))))
      saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
    }
  }

  /** Cumulative-budget prefix filter (A14: keep ordered rows while the
    * running sum of `cost` stays under `budget`; the row that crosses
    * the boundary is kept — mirrors the reference's truncate-last
    * behavior at enhanced_internal_db_service.py:796-809). Window is
    * unpartitioned by design: result sets here are tiny (top-k docs),
    * never a full table. */
  def cumulativeBudget(df: DataFrame, order: Seq[Column], cost: Column,
                       budget: Long): DataFrame = {
    val w = Window.orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_spent", coalesce(sum(cost).over(w), lit(0L)))
      .filter(col("_spent") < budget)
      .drop("_spent")
  }

  /** Exact semi-join on an integral key via a broadcast BITMAP instead
    * of a broadcast hash relation. Result equals
    * `fact.join(broadcast(keys), fact(factKey) === keys(keyCol), "left_semi")`
    * (spec-asserted, nulls never match on either path).
    *
    * Why: existence-only semantics don't need a hash table. The
    * broadcast semi join's driver chain at the 100× bench point —
    * collect 0.14 s + SINGLE-THREADED 3 M-row HashedRelation build
    * 1.00 s + 254 MB transmit 0.26 s (`join_floor_profile`) — was
    * 75% of `j4_semijoin`'s wall. Here the same parallel collect
    * feeds a `long[]` bitset OR-built in ~15 ms, the broadcast is
    * range/8 bytes (7.5 MB for a 60 M-key span), and the probe is a
    * codegen filter FUSED INTO THE FACT SCAN — no join operator in
    * the plan at all, the fact is never shuffled, and every scan
    * pushdown/pruning survives untouched.
    *
    * Build is DISTRIBUTED on the dense path (r13): one (min, max,
    * count) aggregate sizes the bitset, then each partition ORs its
    * keys into a local `long[]` and a `treeReduce` merges them — the
    * SAME shape as Spark's own `stat.bloomFilter` treeAggregate. The
    * driver never materializes a single key row; it only ever holds
    * the span/8-byte bitset, so the dense path has NO driver-fit
    * contract on the key COUNT at all (the r12 eager driver collect +
    * Row decode was measured at ~0.85 s of j4's 1.3 s wall at the
    * x100 point — the fixed ProfileJoin timer exposed it; the
    * distributed build deletes it).
    *
    * Sparse/overflow spans switch to an open-addressing long hash set
    * ([[graft.plans.LongSetContains]], 16 bytes/key at ≤50% load) —
    * still exact, still scan-fused, still NO join operator. That
    * structure's SIZE is proportional to the key count, so the sparse
    * path is broadcast-class and GUARDED: the count probe fails
    * loudly past `maxKeys` (never an OOM — the count runs before any
    * driver materialization); key sides beyond that belong to
    * [[bloomSemiJoin]]. TPC-H-style surrogate keys are dense by
    * construction; 64-bit hashed/sparse keys get the same join-free
    * plan under the guard.
    *
    * EAGER-SNAPSHOT semantics (r12 advisory): the probe structure is
    * built at CONSTRUCTION time — building or explaining the returned
    * plan runs the build jobs, and the returned DataFrame's key
    * membership is a snapshot taken now (re-executions do NOT re-read
    * a changed keys input). Deliberate: the operator trades plan
    * laziness for deleting the broadcast hash join's serial driver
    * build. At 1000-executor scale the bitset ships once per executor
    * via torrent broadcast — smaller and cheaper than the equivalent
    * HashedRelation by ~an order of magnitude. */
  def bitmapSemiJoin(fact: DataFrame, keys: DataFrame, factKey: String,
                     keyCol: String,
                     maxBitmapBytes: Long = 64L << 20,
                     maxKeys: Int = 32 << 20): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val spark = fact.sparkSession
    val keyDf = keys.select(col(keyCol).cast("long").as("k"))
      .where(col("k").isNotNull)
    // one parallel aggregate sizes everything BEFORE any driver
    // materialization: a misused corpus-sized keys side surfaces as
    // the sparse-path require below, never as a driver OOM
    val st = keyDf.agg(count(lit(1)), min("k"), max("k")).head()
    val n = st.getLong(0)
    if (n == 0L) return fact.where(lit(false))
    val mn = st.getLong(1); val mx = st.getLong(2)
    // range arithmetic in BigInt: mx-mn can overflow Long for
    // adversarial key spaces, which MUST take the hash-set path
    val spanBits = BigInt(mx) - BigInt(mn) + 1
    if (spanBits > BigInt(maxBitmapBytes) * 8) {
      require(n <= maxKeys,
        s"bitmapSemiJoin: sparse key side has $n rows > maxKeys=$maxKeys — " +
          "the hash-set probe is broadcast-class (16 bytes/key); for key " +
          "sides beyond driver memory use bloomSemiJoin (distributed " +
          "build) or a plain shuffle semi join")
      val keyArr = keyDf
        .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect()
      val (table, hasZero) = buildLongSet(keyArr)
      val bc = spark.sparkContext.broadcast(table)
      fact.where(ColumnBridge.column(graft.plans.LongSetContains(
        ColumnBridge.expression(fact(factKey).cast("long")), bc, hasZero)))
    } else {
      val nWords = ((spanBits.toLong + 63) >>> 6).toInt
      val minVal = mn
      // distributed OR-build: per-partition local bitsets, tree-merged;
      // empty partitions emit nothing (n > 0 guarantees one survivor).
      // Coalesce bounds the merge traffic to 8x the bitset size — the
      // OR fill is memory-bandwidth work 8 tasks already saturate
      val keyRdd = keyDf.as[Long](org.apache.spark.sql.Encoders.scalaLong).rdd
      val buildPar = math.max(1, math.min(8, keyRdd.getNumPartitions))
      val words = keyRdd.coalesce(buildPar).mapPartitions { it =>
          if (it.isEmpty) Iterator.empty
          else {
            val arr = new Array[Long](nWords)
            it.foreach { k =>
              val idx = k - minVal
              arr((idx >>> 6).toInt) |= 1L << (idx & 63)
            }
            Iterator.single(arr)
          }
        }.reduce { (a, b) =>
          // driver-side incremental OR of ≤buildPar partial bitsets —
          // one job, results streamed in as tasks finish
          var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a
        }
      val bc = spark.sparkContext.broadcast(words)
      fact.where(ColumnBridge.column(graft.plans.BitmapContains(
        ColumnBridge.expression(fact(factKey).cast("long")), bc, mn)))
    }
  }

  /** Power-of-two open-addressing long hash set (linear probing, 0 as
    * the empty sentinel carried out-of-band) at ≤50% load — the build
    * side of the sparse-key probe. One array-fill pass: ~30 ms for
    * 3 M keys vs the ~1.0 s serial UnsafeRow HashedRelation build the
    * broadcast semi join pays for the same keys. */
  private def buildLongSet(keys: Array[Long]): (Array[Long], Boolean) = {
    var cap = 8
    while (cap < keys.length * 2 && cap > 0) cap <<= 1
    require(cap > 0, s"bitmapSemiJoin: ${keys.length} keys overflow the hash-set capacity")
    val mask = cap - 1
    val table = new Array[Long](cap)
    var hasZero = false
    keys.foreach { k =>
      if (k == 0L) hasZero = true
      else {
        var h = k
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
        h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
        h ^= h >>> 33
        var pos = (h & mask).toInt
        while (table(pos) != 0L && table(pos) != k) pos = (pos + 1) & mask
        table(pos) = k
      }
    }
    (table, hasZero)
  }

  /** Semi-join for key sides TOO LARGE to collect to the driver at
    * all — the 100 TB posture, and the one member of the scan-fused
    * probe family with NO driver-fit contract on the keys side. Two
    * phases, both distributed:
    *
    *  1. a Bloom filter over the keys is built with
    *     `DataFrame.stat.bloomFilter` (treeAggregate — executors fold
    *     partitions into partial filters, the driver only ever merges
    *     filter BITS, never holds keys) and broadcast; the codegen
    *     [[graft.plans.BloomMightContainLong]] probe fuses into the
    *     fact scan and discards the (1−selectivity)·(1−fpp) of the
    *     fact that cannot match, BEFORE any exchange;
    *  2. an exact semi join over the survivors removes the fpp false
    *     positives — result equality with the plain semi join is
    *     property-spec-asserted, so the approximation never leaks.
    *
    * This is Spark's own runtime-filter technique
    * (InjectRuntimeFilter) made explicit and composable: at scale the
    * win is the fact-side EXCHANGE shrinking by ~the key selectivity,
    * which dominates the one extra scan-fused probe. Prefer
    * [[bitmapSemiJoin]] when the keys fit the driver (it deletes the
    * join entirely); use this when they don't. */
  def bloomSemiJoin(fact: DataFrame, keys: DataFrame, factKey: String,
                    keyCol: String, expectedKeys: Long,
                    fpp: Double = 0.01): DataFrame = {
    val pre = bloomPrefilter(fact, keys, factKey, keyCol, expectedKeys, fpp)
    pre.join(keys.select(col(keyCol).cast("long").as("_blm_key")).distinct(),
      pre(factKey).cast("long") === col("_blm_key"), "left_semi")
  }

  /** Phase 1 of [[bloomSemiJoin]], exposed for composition and for the
    * property spec's false-positive-rate measurement: the fact rows
    * whose key MIGHT be in `keys` (exact negatives, ~fpp false
    * positives). APPROXIMATE — callers needing semi-join semantics
    * must verify, as [[bloomSemiJoin]] does. */
  def bloomPrefilter(fact: DataFrame, keys: DataFrame, factKey: String,
                     keyCol: String, expectedKeys: Long,
                     fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val spark = fact.sparkSession
    val bloom = keys.where(col(keyCol).isNotNull)
      .stat.bloomFilter(col(keyCol).cast("long"), expectedKeys, fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    fact.where(ColumnBridge.column(graft.plans.BloomMightContainLong(
      ColumnBridge.expression(fact(factKey).cast("long")), bc)))
  }

  /** Scan-fused dimension LOOKUP join: generalizes [[bitmapSemiJoin]]
    * from existence to VALUE ATTACHMENT for a dense integral PK and a
    * low-cardinality payload column — `fact ⋈ dim` becomes a
    * broadcast byte array indexed by `key − min` holding dictionary
    * CODES, probed by the codegen [[graft.plans.DenseByteLookup]]
    * fused into the fact scan, plus a literal-array dictionary decode.
    * Result equals `fact.join(broadcast(dim), factKey === keyCol)`
    * for a UNIQUE-keyed dim (spec-asserted; duplicate dim keys are
    * rejected loudly — a dense array cannot express row
    * multiplication).
    *
    * Why: the broadcast hash join ships every dim row as UnsafeRows
    * and builds a LongHashedRelation SERIALLY on the driver — measured
    * 0.80 s build + 0.26 s transmit of 254 MB for a 3 M-row
    * (long, string) dim at the x100 bench point (r12
    * join_floor_profile on salted_join), ~60% of the join's wall.
    * Dict-coding the payload ships span bytes (60 MB for the same
    * dim) built in one ~30 ms array fill, and the probe is O(1)
    * branch-free inside whole-stage codegen — no join operator, no
    * fact shuffle, every pushdown survives.
    *
    * Same EAGER-SNAPSHOT semantics as [[bitmapSemiJoin]], and — like
    * its dense path — the build is DISTRIBUTED (r13): one aggregate
    * computes (count, distinct keys, distinct values, min, max) for
    * the contract checks, the ≤127-value dictionary is the only
    * driver collect, and the codes array is built per-partition and
    * tree-merged — the driver never holds a dim row, so there is NO
    * key-count driver contract (the span check alone bounds the
    * array). The r12 driver collect of 3 M (long, string) Rows was
    * ~1.2-1.7 s of salted_join's wall at the x100 point (fixed
    * ProfileJoin timer); the distributed build deletes it. Falls back
    * to the plain broadcast join when the key span exceeds
    * `maxCodesBytes` or the payload cardinality exceeds 127 (byte
    * codes; a dict that size stopped being "low-cardinality" anyway).
    * Duplicate dim keys are rejected loudly — a dense array cannot
    * express row multiplication. */
  def denseLookupJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                      keyCol: String, valueCol: String,
                      maxCodesBytes: Long = 96L << 20): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val spark = fact.sparkSession
    def fallback = fact.join(
      broadcast(dim.select(col(keyCol).cast("long").as("_dlj_key"),
        col(valueCol))),
      fact(factKey).cast("long") === col("_dlj_key")).drop("_dlj_key")
    val dimDf = dim.select(col(keyCol).cast("long").as("k"),
      col(valueCol).as("v")).where(col("k").isNotNull)
    // cheap sizing agg only — NO count_distinct here: multi-distinct
    // aggregates plan an Expand (x-per-distinct row blow-up, measured
    // 1.7 s of pure overhead on the 3 M-row dim at the x100 point);
    // duplicate keys are instead detected inside the build merge below
    // for free, and dict cardinality by the limit(128) take
    val st = dimDf.agg(count(lit(1)), min("k"), max("k")).head()
    val n = st.getLong(0)
    if (n == 0L)
      return fact.where(lit(false))
        .withColumn(valueCol, lit(null).cast(dim.schema(valueCol).dataType))
    val mn = st.getLong(1); val mx = st.getLong(2)
    val span = BigInt(mx) - BigInt(mn) + 1
    // dictionary probe: TakeOrdered of the distinct values, capped at
    // 128 — a 128th value means >127 and the contract says fall back
    val dictRows = dimDf.select("v").distinct().orderBy("v").limit(128)
      .collect().map(_.get(0))
    if (span > BigInt(maxCodesBytes) || dictRows.length > 127) fallback
    else {
      val dict = dictRows
      val codeOf: Map[Any, Byte] =
        dict.zipWithIndex.map { case (v, i) => v -> i.toByte }.toMap
      val spanInt = span.toInt
      val minVal = mn
      val noDup = Long.MinValue
      // distributed fill + tree merge. Coalesce bounds the merge
      // traffic: P partitions each ship a span-byte array, so P=8
      // keeps the movement at 8x span instead of (scan splits)x span
      // — at 32 splits on a 60 MB span that was 1.9 GB of array
      // shuffle for a 3 M-row dim (measured; the fill itself is
      // memory-bandwidth work that 8 tasks saturate locally).
      val buildPar = math.max(1, math.min(8, dimDf.rdd.getNumPartitions))
      val (codes, dupKey) = dimDf.rdd.coalesce(buildPar).mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val arr = new Array[Byte](spanInt)
          java.util.Arrays.fill(arr, (-1).toByte)
          var dup = noDup
          it.foreach { r =>
            val k = r.getLong(0)
            val idx = (k - minVal).toInt
            if (arr(idx) != -1 && dup == noDup) dup = k
            arr(idx) = codeOf(r.get(1))
          }
          Iterator.single((arr, dup))
        }
      }.reduce { case ((a, da), (b, db)) =>
        // driver-side incremental merge of ≤buildPar partial arrays
        // (transient driver footprint bounded by buildPar x span)
        var dup = if (da != noDup) da else db
        var i = 0
        while (i < a.length) {
          if (b(i) != -1) {
            if (a(i) != -1 && dup == noDup) dup = i + minVal
            a(i) = b(i)
          }
          i += 1
        }
        (a, dup)
      }
      if (dupKey != noDup)
        throw new IllegalArgumentException(
          s"requirement failed: denseLookupJoin: duplicate dim key $dupKey — " +
            "a dense lookup cannot express row multiplication; dedupe the " +
            "dim or use a plain join")
      val bc = spark.sparkContext.broadcast(codes)
      val codeCol = ColumnBridge.column(graft.plans.DenseByteLookup(
        ColumnBridge.expression(fact(factKey).cast("long")), bc, mn))
      fact.withColumn("_dlj_code", codeCol)
        .where(col("_dlj_code") >= 0)
        .withColumn(valueCol,
          element_at(array(dict.map(lit(_)).toSeq: _*), col("_dlj_code") + 1))
        .drop("_dlj_code")
    }
  }
}
