"""Deterministic sampling / splitting / packing for training-data
pipelines.

Random sampling (``df.sample``, ``sampleBy``) is seed-dependent AND
partitioning-dependent — rerun the job with different file splits and
you get a different corpus. At 100 TB the reproducibility contract is
content-hash based: a row's membership in a sample/split is a pure
function of its key, so any engine, any partitioning, any rerun —and
the DuckDB oracle— agree row-for-row. (The same trick the reference
uses nowhere; standard practice in large-corpus curation.)

All operators are built-in Column algebra (md5 → hex slice → int), no
Python, no shuffle except where the semantics require one:

- ``hash_bucket`` / ``hash_sample``: md5(salt+key) → bucket in
  [0, buckets); sampling keeps bucket < fraction*buckets. Zero shuffle:
  a pure per-row filter that pushes into the scan's residual.
- ``dataset_split``: the same bucket → train/val/test label by
  cumulative weight boundaries. Disjoint and exhaustive by
  construction; stable under corpus growth (a doc never changes split
  when other docs arrive — the property random splits lack).
- ``pack_sequences``: greedy contiguous sequence packing — per
  partition key, running token total DIV budget = pack id. One window
  shuffle on the partition key; deterministic given the order column.
- ``label_balance``: per-label counts + corpus fraction (windowed
  total) — the class-balance report that gates mixture reweighting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_BUCKETS = 10_000


def hash_bucket(
    key: Column, salt: str = "", buckets: int = HASH_BUCKETS
) -> Column:
    """Deterministic bucket in [0, buckets): first 8 md5 hex chars of
    salt+key as an integer, mod buckets. Engine-portable (md5 and
    base-16 conversion are bit-identical everywhere)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return h % buckets


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "",
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership a pure function of the
    key (reproducible across reruns/partitionings/engines)."""
    return df.filter(
        hash_bucket(F.col(key_col), salt, buckets) < int(fraction * buckets)
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep ~``fractions[stratum]``
    of each stratum's rows (``default_fraction`` for strata not listed),
    membership a pure function of the key hash — the reweighting
    primitive for corpus curation (downsample the dominant language /
    source, keep the tail).

    The per-stratum threshold compiles to a literal CASE over the
    stratum column — a pure per-row filter, zero shuffle, pushed into
    the scan's residual like ``hash_sample``. (A join against a rates
    dim would broadcast fine but can't push into the scan.)
    """
    bucket = hash_bucket(F.col(key_col), salt, buckets)
    thresh: Column | None = None
    for name, frac in fractions.items():
        cond = F.col(strata_col) == name
        bound = int(frac * buckets)
        thresh = (
            F.when(cond, bound) if thresh is None else thresh.when(cond, bound)
        )
    thresh = (
        F.lit(int(default_fraction * buckets))
        if thresh is None
        else thresh.otherwise(int(default_fraction * buckets))
    )
    return df.filter(bucket < thresh)


def dataset_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "",
    buckets: int = HASH_BUCKETS,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row a split label with probability ∝ weights —
    deterministically, from the key hash. Weights need not sum to 1;
    they are normalized. Labels are assigned in dict order."""
    total = sum(weights.values())
    bucket = hash_bucket(F.col(key_col), salt, buckets)
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        bound = int(acc * buckets)
        cond = bucket < bound
        expr = (
            F.when(cond, name)
            if expr is None
            else expr.when(cond, name)
        )
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(names[-1])
    )
    return df.withColumn(split_col, expr)


def pack_sequences(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    token_col: str,
    budget: int,
    pack_col: str = "pack_id",
) -> DataFrame:
    """Greedy contiguous packing: within each partition key (e.g.
    language/source), documents in ``order_col`` order fill packs of
    ~``budget`` tokens; pack id = exclusive running token total DIV
    budget. A document longer than the budget gets its own pack(s)
    (training-side truncation handles the tail). One Window shuffle."""
    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    # floor division on integers (a double-division + cast would differ
    # between engines on .5 boundaries: truncate vs round)
    return df.withColumn(pack_col, F.floor(cum_excl / budget).cast("bigint"))


def corpus_mixture(
    sources: list[tuple[str, DataFrame, float]],
    key_col: str,
    salt: str = "",
    source_col: str = "source_name",
) -> DataFrame:
    """Weighted corpus mixing: each (name, df, rate) source contributes
    its hash-sampled fraction ``rate``, tagged with ``source_col``, and
    the results union by name. Deterministic end-to-end — the mixture a
    training run reads is reproducible row-for-row. Rates > 1.0 are
    clamped (upsampling-by-repeat is a separate, order-defining step).
    Pure narrow ops: per-source filter + union, no shuffle."""
    parts = []
    for name, df, rate in sources:
        part = hash_sample(df, key_col, min(rate, 1.0), salt=f"{salt}:{name}")
        parts.append(part.withColumn(source_col, F.lit(name)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def label_balance(
    df: DataFrame, label_col: str, weight_col: str | None = None
) -> DataFrame:
    """Per-label count (or weight sum) and corpus fraction — one
    aggregation plus a scalar window over its (tiny) result."""
    measure = (
        F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)
    )
    agg = df.groupBy(label_col).agg(measure.cast("bigint").alias("n"))
    return agg.select(
        label_col,
        "n",
        F.round(F.col("n") / F.sum("n").over(Window.partitionBy()), 6).alias(
            "fraction"
        ),
    )


def shuffle_shards(
    df: DataFrame,
    num_shards: int = 8,
    seed: str = "shuf-v1",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training shuffle: every row gets a shard id
    and a position within its shard from a seeded hash of its key —
    the reshuffle a pretraining run needs before sharded sequential
    reads. Hash-derived order is reproducible across runs, input
    partitionings, and cluster sizes (an ``ORDER BY rand()`` is none
    of those), and changing ``seed`` is a fresh epoch-level permutation
    with zero extra state.

    → input columns + (shard, shard_pos). Write with
    ``partitionBy("shard")`` and readers stream each shard in
    ``shard_pos`` order.

    Scale shape: ONE shuffle, on the (uniform, hash-derived) shard key;
    the within-shard position is a window over that same partitioning —
    no global sort, no skew (hashes are uniform by construction). The
    hash is md5-derived, so external readers and the SQL oracle can
    recompute the exact permutation.
    """
    from pyspark.sql.window import Window

    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{seed}:"), F.col(key_col).cast("string")
                )
            ),
            18,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    out = df.withColumn("_h", h).withColumn(
        "shard", F.pmod(F.col("_h"), F.lit(int(num_shards))).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col(key_col).asc())
    return out.withColumn(
        "shard_pos", F.row_number().over(w).cast("bigint")
    ).drop("_h")


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    group_col: str | None = None,
    key_col: str = "doc_id",
    salt: str = "ws-v1",
    race_col: str = "race_key",
) -> DataFrame:
    """Weighted k-sample WITHOUT replacement via the exponential race
    (Efraimidis–Spirakis, Inf. Process. Lett. 97(5), 2006, in its
    -ln(u)/w form): each row draws u ~ U(0,1] from md5(salt+key) and
    races with key Exp(weight); the k smallest race keys win, which
    realizes exactly the sequential weighted-without-replacement
    distribution. Training-data use: quality- or domain-weighted corpus
    subsetting that is reproducible across reruns, partitionings, and
    engines (u is a content hash, not a seed stream).

    Rows with NULL or non-positive weight are excluded (they'd race at
    infinity anyway). Grouped: one shuffle on ``group_col``, per-group
    top-k by window rank. Ungrouped: TakeOrderedAndProject — per-
    partition top-k then a single merge, never a global sort.

    Cross-engine caveat (documented, not hidden): the race key goes
    through libm ``ln`` — engines agree to ~1 ulp, so two rows whose
    keys collide within ~1e-15 relative could rank differently across
    engines. With 60-bit hash entropy the collision probability is
    negligible; the value oracles at three SFs back that up.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string"))),
                18,
                15,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 60))
    race = -F.log(u) / F.col(weight_col).cast("double")
    out = df.filter(F.col(weight_col) > 0).withColumn(race_col, race)
    if group_col is None:
        return out.orderBy(F.col(race_col).asc(), F.col(key_col).asc()).limit(k)
    w = Window.partitionBy(group_col).orderBy(
        F.col(race_col).asc(), F.col(key_col).asc()
    )
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def sampled_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    fraction: float = 0.1,
    key_col: str = "event_id",
    group_col: str | None = None,
    salt: str = "sq-v1",
) -> DataFrame:
    """Exact interpolated quantiles of a DETERMINISTIC hash sample —
    the honest scalable quantile path. A full-data exact percentile
    sorts every group; ``approx_percentile`` is cheap but its sketch is
    engine-private. This takes the third road: keep the ~``fraction``
    hash-sample (a pure per-row filter that pushes into the scan — the
    sample is reproducible, auditable, and engine-replayable), then
    compute EXACT linear-interpolation percentiles on it. Sampling
    error ~ O(1/sqrt(fraction·n)) per group; at 100 TB a 1% sample is
    still ~10^9 rows of support, far tighter than any sketch bound.

    → per group: n_sample + one ``q<p>`` column per requested prob.
    """
    sample = hash_sample(df, key_col, fraction, salt)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_sample")] + [
        F.round(F.percentile(F.col(value_col).cast("double"), p), 6).alias(
            f"q{round(p * 100)}"
        )
        for p in probs
    ]
    if group_col is None:
        return sample.agg(*aggs)
    return sample.groupBy(group_col).agg(*aggs)


def stratified_exact_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str,
    salt: str = "ses-v1",
) -> DataFrame:
    """EXACTLY ``n_per_stratum`` rows per stratum (fewer only if the
    stratum is smaller) — the balanced-eval-set / few-shot-pool
    construction fraction-based sampling can't give: quotas, not
    rates. Rows are ranked inside each stratum by the 60-bit md5 of
    salt+key (a deterministic pseudorandom order — reruns, engines,
    and partitionings all agree), key as the total-order tiebreak.

    Scale shape: ONE shuffle on the stratum key; rank is a window
    top-n, which Spark executes with WindowGroupLimit pushdown (each
    partition keeps a bounded heap — rows beyond the quota never
    reach the final sort buffer).

    → input columns + ``sample_rank`` (1..n within the stratum).
    """
    # NULL keys would make concat/md5 NULL and sort first, silently
    # claiming the top quota slots. A shared sentinel would be worse
    # than it looks: all NULL rows would share ONE hash, tie on both
    # sort keys (nondeterministic picks when the quota boundary falls
    # inside the cluster) and land adjacent instead of independently
    # scattered — and a literal key equal to the sentinel would
    # collide. Instead each NULL-key row gets a per-row surrogate:
    # xxhash64 over the full row (deterministic, partition-invariant,
    # JVM-side), prefixed with \x00 so it can't equal any real key.
    row_surrogate = F.concat(
        F.lit("\x00"), F.xxhash64(*[F.col(c) for c in df.columns]).cast("string")
    )
    key_str = F.coalesce(F.col(key_col).cast("string"), row_surrogate)
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key_str)), 18, 15),
        16,
        10,
    ).cast("bigint")
    # key_str (not key_col) as final tiebreak keeps the order total for
    # NULL-key rows too; identical duplicate rows still tie, but they
    # are indistinguishable so either pick yields the same result set
    w = Window.partitionBy(strata_col).orderBy(
        h.asc(), F.col(key_col).asc_nulls_last(), key_str.asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    budget: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """Target domain-mixture rebalancing: sample the corpus DOWN to a
    token/document budget distributed across groups by target weights
    (the data-mixing step of every pretraining recipe — DoReMi-style
    domain reweighting applied as hard quotas). Group ``g`` gets
    ``floor(budget · w_g / Σw)`` rows; a smaller group contributes
    what it has, and groups absent from ``weights`` contribute
    nothing. Within each group rows are ranked by the same
    deterministic 60-bit md5 order as :func:`stratified_exact_sample`
    (salt+key hash, key tiebreak — reruns, engines, and partitionings
    all agree).

    The integer quotas are computed driver-side from the weights and
    embedded as a literal map, so the plan is ONE window shuffle on
    the group key with WindowGroupLimit pushdown — identical shape to
    the uniform-quota sampler, no second pass, no join.

    → input columns + ``sample_rank`` (1..quota within the group).
    """
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    # exact rational floor — float truncation of budget·w/Σw can be
    # off by one when the weight ratio is not representable, silently
    # diverging from the documented floor(budget·w/Σw)
    from fractions import Fraction

    total_f = sum(Fraction(wt) for wt in weights.values())
    quotas = {
        g: int(Fraction(budget) * Fraction(wt) / total_f)
        for g, wt in weights.items()
    }
    quota_lit = F.create_map(
        *[F.lit(x) for kv in quotas.items() for x in kv]
    )
    # same NULL-key discipline as stratified_exact_sample: per-row
    # surrogate so NULL keys neither sort first nor cluster
    row_surrogate = F.concat(
        F.lit("\x00"),
        F.xxhash64(*[F.col(c) for c in df.columns]).cast("string"),
    )
    key_str = F.coalesce(F.col(key_col).cast("string"), row_surrogate)
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key_str)), 18, 15),
        16,
        10,
    ).cast("bigint")
    w = Window.partitionBy(group_col).orderBy(
        h.asc(), F.col(key_col).asc_nulls_last(), key_str.asc()
    )
    quota = F.coalesce(quota_lit[F.col(group_col)], F.lit(0))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= quota)
    )
