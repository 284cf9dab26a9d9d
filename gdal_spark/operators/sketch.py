"""Distributed sketches for corpus-scale statistics.

Two classic fixed-size summaries a 100 TB pipeline leans on where
exact answers would shuffle the world:

* HyperLogLog distinct-count (Flajolet et al. 2007) — per-group
  register tables of fixed size 2^P; the corpus-side work is a
  map-only hash + a groupBy over at most ``groups * 2^P`` keys with
  map-side MAX partials.  Unlike Spark's builtin
  ``approx_count_distinct`` (whose HLL++ hash is not reproducible
  outside the JVM), the hash here is md5-derived, so the register
  table — and therefore the estimate — is bit-identical in any
  engine: the DuckDB oracle recomputes the whole sketch.
* Count-Min (Cormode & Muthukrishnan 2005) — D independent
  md5-derived rows of W counters; the sketch is a ``D*W``-row table
  built with one map-side-combined groupBy.  Estimates join the
  (broadcast) sketch D times and take the row-wise MIN.

Reference role: GDAL's approximate paths (GetHistogram approx_ok,
overview-sampled statistics) trade exactness for a bounded scan the
same way; there is no reference sketch to bit-match, so both
operators carry engine-reproducible constructions instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HLL_P = 6                      # 2^6 = 64 registers
HLL_REG_BITS = 54              # bits examined for the leading-1 rank

# bias-correction constant alpha_m for m = 64 (Flajolet et al. Fig. 3)
HLL_ALPHA_64 = 0.709


def _hash60(val: Column, salt: str) -> Column:
    """60-bit md5-derived hash as int64 (the dedup digest idiom)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), val.cast("string"))), 1, 15),
        16, 10).cast("long")


def hll_registers(df: DataFrame, value_col: str, group_cols: list[str],
                  p: int = HLL_P) -> DataFrame:
    """Per-group HLL register table: (group..., bucket, max_rho).

    bucket = low ``p`` bits of the hash; rho = 1-based position of the
    leading 1 bit in the remaining HLL_REG_BITS bits (all-zero ->
    HLL_REG_BITS + 1).  The rank comes from a fixed-width binary
    string + instr — exact and portable, no float log anywhere.
    Missing buckets (no value hashed there) are absent rows,
    equivalent to register 0.
    """
    m = 1 << p
    h = _hash60(F.col(value_col), "hll:")
    bucket = F.pmod(h, F.lit(m))
    # bit shift, NOT floor(h / m): h has up to 60 bits, and / would
    # round-trip through double (53-bit mantissa) — inexact.
    rem = F.shiftright(h, p).cast("long")
    binstr = F.lpad(F.conv(rem.cast("string"), 10, 2), HLL_REG_BITS, "0")
    rho = F.when(rem == 0, F.lit(HLL_REG_BITS + 1)).otherwise(
        F.instr(binstr, "1"))
    return (df.select(*group_cols, bucket.alias("bucket"),
                      rho.cast("long").alias("rho"))
            .groupBy(*group_cols, "bucket")
            .agg(F.max("rho").alias("max_rho")))


def hll_estimate(df: DataFrame, value_col: str, group_cols: list[str],
                 p: int = HLL_P) -> DataFrame:
    """Per-group HLL cardinality estimate with the original
    small-range (linear counting) correction.  All float inputs are
    small integers (register maxes, zero counts), so the rounded
    estimate reproduces across engines.
    """
    m = 1 << p
    regs = hll_registers(df, value_col, group_cols, p)
    # sum of 2^-rho over PRESENT buckets, as an exact scaled integer:
    # 2^(BITS+1-rho) summed, then divided by 2^(BITS+1) once.
    scale = 1 << (HLL_REG_BITS + 1)
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), "
                     f"cast({HLL_REG_BITS + 1} - max_rho as int))"))
        .alias("denom_scaled"),
        F.count("*").alias("n_present"))
    zeros = F.lit(m) - F.col("n_present")
    denom = (F.col("denom_scaled").cast("double") / F.lit(float(scale))
             + zeros.cast("double"))            # absent buckets: 2^-0 = 1
    raw = F.lit(HLL_ALPHA_64 * m * m) / denom
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    ).otherwise(raw)
    return agg.select(*group_cols,
                      F.round(est, 2).alias("hll_estimate"),
                      (F.lit(m) - F.col("n_present")).cast("long")
                      .alias("empty_buckets"))


# ------------------------------------------------------------ Count-Min

CM_DEPTH = 4
CM_WIDTH = 512


def cm_sketch(df: DataFrame, value_col: str, d: int = CM_DEPTH,
              w: int = CM_WIDTH) -> DataFrame:
    """Build the Count-Min table: (row, bucket, cnt), d*w rows max.
    One groupBy with map-side partials; the explode fan-out is the
    constant d."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row")
    base = df.select(F.col(value_col).cast("string").alias("_v"), rows)
    bucket = F.pmod(_hash60(F.col("_v"), "cm:")
                    + F.col("row") * _hash60(F.col("_v"), "cm2:"),
                    F.lit(w))
    return (base.select("row", bucket.alias("bucket"))
            .groupBy("row", "bucket").agg(F.count("*").alias("cnt")))


def cm_estimate(terms: DataFrame, sketch: DataFrame, term_col: str = "term",
                d: int = CM_DEPTH, w: int = CM_WIDTH) -> DataFrame:
    """Point-query the sketch for each term: join the (broadcast,
    d*w-row) sketch on each of the d (row, bucket) coordinates and
    take the MIN — the classic overestimate-only bound."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row")
    probes = terms.select(F.col(term_col).alias("term"), rows)
    bucket = F.pmod(_hash60(F.col("term"), "cm:")
                    + F.col("row") * _hash60(F.col("term"), "cm2:"),
                    F.lit(w))
    probes = probes.select("term", "row", bucket.alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return (joined.groupBy("term")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .cast("long").alias("est")))


# ------------------------------------------------------------- Bloom filter
BF_M = 4096   # bit-space size
BF_K = 4      # hash functions


def bloom_bits(df: DataFrame, value_col: str,
               m: int = BF_M, k: int = BF_K) -> DataFrame:
    """Distributed Bloom-filter build (Bloom 1970): the filter is the
    DISTINCT set of bit positions over k md5-derived hashes — a
    map-only explode + an O(m)-bounded distinct, mergeable across any
    partitioning (set union = the Bloom OR).  Returns (bit) rows,
    at most ``m`` of them regardless of corpus size."""
    pos = [F.pmod(_hash60(F.col(value_col), f"bf{i}:"), F.lit(m))
           for i in range(k)]
    return (df.select(F.explode(F.array(*pos)).alias("bit"))
            .distinct())


def bloom_contains(queries: DataFrame, bits: DataFrame, value_col: str,
                   m: int = BF_M, k: int = BF_K) -> DataFrame:
    """Membership probe: maybe_present iff ALL k probe bits are set.
    The bit table is <= m rows — Spark broadcasts it; the probe side
    never shuffles."""
    pos = [F.pmod(_hash60(F.col(value_col), f"bf{i}:"), F.lit(m))
           for i in range(k)]
    probes = queries.select(
        F.col(value_col), F.explode(F.array(*pos)).alias("bit"))
    # bool_and over per-probe-row hits, NOT sum == k: duplicate query
    # rows of the same value pool 2k probe rows under the group, and a
    # count equality would report a false negative — violating Bloom's
    # zero-false-negative guarantee (ADVICE r3).
    hit = (probes.join(F.broadcast(bits.withColumn("_set", F.lit(1))),
                       "bit", "left")
           .groupBy(value_col)
           .agg(F.bool_and(F.col("_set").isNotNull())
                .alias("maybe_present")))
    return hit
