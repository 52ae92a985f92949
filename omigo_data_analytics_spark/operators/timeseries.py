"""Time-series relational operators Spark lacks natively: as-of join,
interval (range) join, and gap-based sessionization.

The reference engine's workloads are event/telemetry tables (its window
aggregate DF:5105-5180 and time-ordered graph filters GT:214-300 both
assume per-key time ordering); these operators complete that family with
the three standard time-series joins a training-data / analytics pipeline
needs.

Scale design (the point of each implementation):

* ``asof_join`` — NOT a range join. Both sides are tagged and unioned,
  then a single window pass per key carries the most recent right-side
  row forward. One shuffle on the join key, no inequality join, no
  candidate blowup: cost is O(n log n) per key regardless of how far back
  the match is. This is the plan you want at 100 TB; a naive
  ``t_left >= t_right`` join is quadratic per key.
* ``range_join`` — inequality joins have no hash strategy in any engine;
  the distributed answer is binning: quantize the point side and explode
  the interval side into the bins it overlaps, equi-join on
  (key, bin), then re-check the exact predicate. Shuffle is
  O(rows x avg_bins); pick ``bin_width`` near the typical interval
  length so avg_bins stays ~2.
* ``sessionize`` — two window functions over ONE sort: lag to flag gap
  breaks, running sum over the same (key, time) order to number
  sessions. Catalyst plans both in a single Exchange+Sort pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..core.dataframe import OmigoDF


def _df(x) -> DataFrame:
    return x.df if isinstance(x, OmigoDF) else x


def _epoch_sec(df: DataFrame, col: str, ref: Column | None = None) -> Column:
    """Time column as epoch-seconds double, whatever its type: TIMESTAMP /
    TIMESTAMP_NTZ go through unix_micros (NTZ casts to session-TZ
    timestamp first — NTZ cannot cast straight to numeric), numerics and
    strings cast directly. ``ref`` supplies a dataframe-QUALIFIED column
    for join conditions where a bare F.col(name) would be ambiguous."""
    dt = df.schema[col].dataType.typeName()
    c = ref if ref is not None else _qc(col)
    if dt.startswith("timestamp"):
        return (F.unix_micros(c.cast("timestamp")) / F.lit(1e6))
    return c.cast("double")


def _qc(name: str) -> Column:
    """F.col with the name QUOTED: F.col/partitionBy/groupBy/select all
    PARSE bare strings, so a dot or backtick in a user column name is a
    struct access or a syntax error (r13 hostile-name sweep — the r12
    hardening covered core/dataframe.py; this extends it to the
    time-series family)."""
    from ..core import colutils
    return F.col(colutils.quote(name))


def _qcs(names) -> list:
    return [_qc(n) for n in names]


_MAX_BUCKET = (1 << 63) - 1


def _time_bucket(t, span: float):
    """floor(t/span) with NaN pinned to the LAST bucket. Spark's
    floor(NaN/span) is 0, but NaN sorts GREATER than every double in
    the plain windows' order — bucket 0 would silently misplace NaN
    rows relative to the single-window plan (r13 extreme-values sweep
    caught this on merge_intervals; sessionize/rolling/asof share the
    bucket expression). ±Inf already floors to Long.MAX/MIN, which
    sort consistently; +Inf sharing the MAX bucket with NaN is fine —
    the in-bucket (t, ...) order stays exact."""
    return F.when(F.isnan(t), F.lit(_MAX_BUCKET)).otherwise(
        F.floor(t / F.lit(float(span))))


def asof_join(left, right, on: list[str] | str, left_time: str,
              right_time: str | None = None, suffix: str = "r",
              tolerance_sec: float | None = None,
              direction: str = "backward",
              tiebreak_cols: list[str] | None = None,
              time_buckets_sec: float | None = None,
              hot_key_rows: int | str | None = "auto") -> OmigoDF:
    """For each left row, attach the latest right row whose time is <= the
    left row's time (``direction='backward'``, inclusive — the default) or
    the earliest right row whose time is >= it (``'forward'``), matching
    on `on` keys.

    Implementation: tag right rows 0 / left rows 1, union by name, and
    window ``last(payload, ignoreNulls) OVER (PARTITION BY on ORDER BY
    time, side ROWS UNBOUNDED PRECEDING..CURRENT)``. Right rows sort
    before left rows at equal times, so same-timestamp matches are
    visible. Forward is the same single-shuffle plan on negated time.
    ``tolerance_sec`` drops matches further than the given horizon
    (checked after the carry, map-side).

    Right payload columns come back as ``{suffix}:{col}``; rows with no
    match keep nulls (left join semantics).

    Two RIGHT rows sharing (on, right_time) leave the carried payload
    partition-order dependent — the carry window's order is not total
    there (same hazard rolling_aggregate documents, r10 review). Pass
    ``tiebreak_cols`` (right-side payload columns completing a total
    order; the MAX tiebreak tuple wins among equal-time rows, in every
    direction) when right (on, time) can repeat; the default None means
    the caller asserts it is unique.

    The winning right row is carried ATOMICALLY: all payload columns
    ride one struct through a single ``last(ignorenulls=True)``, so a
    NULL cell in the winning row stays NULL in the output (r11 advice
    fix — per-column carries used to backfill such a cell from an
    EARLIER right row, tearing the result across two source rows).

    ``time_buckets_sec`` (r12, hot-key scale path — same straggler as
    sessionize/rolling: the carry window partitioned by a skewed key
    is ONE task, the shuffle-skew class AQE cannot split): the carry
    runs inside (key, time-bucket) partitions; each bucket's LAST
    right row (struct + match time, max (t, tiebreaks) — the same
    winner the window would pick) aggregates into a per-bucket
    summary, a tiny per-key running carry propagates it across bucket
    boundaries, and one null-safe join feeds it back as the carry-in
    for rows with no in-bucket match. Exact — identical to the
    single-window plan (equal times share a bucket, so tie semantics
    are untouched; property-tested). ``hot_key_rows`` (default
    ``"auto"`` = 262,144) routes only hot keys through it, censusing
    the COMBINED left+right rows per key so an as-of pair never splits
    across plans. 'nearest' runs the same bucketed carry in both
    directions before its pick. Without ``time_buckets_sec`` the
    threshold instead arms the zero-extra-job hot-key warning on the
    single-window carry (r15 — see sessionize)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction: {direction}")
    ldf, rdf = _df(left), _df(right)
    keys = [on] if isinstance(on, str) else list(on)
    rt = right_time or left_time

    if time_buckets_sec is not None and time_buckets_sec <= 0:
        raise ValueError("asof_join: time_buckets_sec must be positive")
    if time_buckets_sec is not None and hot_key_rows is not None:
        thr = (AUTO_HOT_KEY_ROWS if hot_key_rows == "auto"
               else int(hot_key_rows))
        combined = ldf.select(*_qcs(keys)).unionByName(rdf.select(*_qcs(keys)))
        hk = _hot_keys_census(combined, keys, thr)
        l_hot, l_cold = _hot_key_split(ldf, keys, thr, hot_keys=hk)
        r_hot, r_cold = _hot_key_split(rdf, keys, thr, hot_keys=hk)
        hot_out = asof_join(OmigoDF(l_hot), OmigoDF(r_hot), on, left_time,
                            right_time, suffix, tolerance_sec, direction,
                            tiebreak_cols, time_buckets_sec,
                            hot_key_rows=None)
        cold_out = asof_join(OmigoDF(l_cold), OmigoDF(r_cold), on,
                             left_time, right_time, suffix, tolerance_sec,
                             direction, tiebreak_cols,
                             time_buckets_sec=None)
        return OmigoDF(hot_out.df.unionByName(cold_out.df))
    if direction == "nearest":
        return _asof_nearest(left, right, on, left_time, right_time,
                             suffix, tolerance_sec, tiebreak_cols,
                             time_buckets_sec)

    r_payload = [c for c in rdf.columns if c not in keys]
    out_names = {c: f"{suffix}:{c}" for c in r_payload}
    tb = _asof_tiebreak(tiebreak_cols, r_payload)

    # degenerate: right has no payload beyond the keys — nothing to carry
    if not r_payload:
        return OmigoDF(ldf)

    # align schemas: one unioned relation with a side tag; forward as-of
    # is backward as-of on negated time. The WHOLE right payload rides
    # one struct column so the carry below picks a single right row
    # atomically — a non-NULL struct with NULL fields is still non-NULL,
    # so last(ignorenulls) never mixes cells from different right rows.
    pay_struct = F.struct(*[_qc(c).alias(c) for c in r_payload])
    sign = F.lit(1.0) if direction == "backward" else F.lit(-1.0)
    r_typed = rdf.select(pay_struct.alias("__r__")).schema["__r__"].dataType
    l_tagged = (ldf
                .withColumn("__t__", sign * _epoch_sec(ldf, left_time))
                .withColumn("__side__", F.lit(1))
                .withColumn("__r__", F.lit(None).cast(r_typed)))
    # NULL-time right rows sort FIRST under the window's ascending order
    # (NULLs first), so their payload would be carried into every left
    # row with no earlier real match — a phantom match whose __match_t__
    # is NULL (r10 review, confirmed both directions). They can never be
    # a legitimate as-of match; drop them before the union.
    r_tagged = (rdf
                .withColumn("__t__", sign * _epoch_sec(rdf, rt))
                .where(F.col("__t__").isNotNull())
                .withColumn("__side__", F.lit(0))
                .withColumn("__r__", pay_struct))
    for c in ldf.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(
                c, F.lit(None).cast(ldf.schema[c].dataType))
    cols = keys + ["__t__", "__side__", "__r__"] \
        + [c for c in ldf.columns if c not in keys]
    u = (l_tagged.select(*[_qc(c) for c in cols])
         .unionByName(r_tagged.select(*[_qc(c) for c in cols])))

    # tiebreak cols order AFTER (__t__, __side__): they only order right
    # rows among themselves (left rows carry NULL payload and sort as a
    # block behind the side tag), so the inclusive same-time semantics
    # are untouched; last() then deterministically picks the max tuple
    if time_buckets_sec is not None:
        carried = _asof_carry_bucketed(u, keys, tb,
                                       float(time_buckets_sec))
    else:
        w_base = Window.partitionBy(*_qcs(keys)).orderBy("__t__",
                                                         "__side__", *tb)
        w = w_base.rowsBetween(Window.unboundedPreceding,
                               Window.currentRow)
        carried = u.select(
            "*",
            F.last("__r__", ignorenulls=True).over(w).alias("__c__"),
            F.last(F.when(F.col("__side__") == 0, F.col("__t__")),
                   ignorenulls=True).over(w).alias("__match_t__"))
        carried = _watch_hot_keys(carried, w_base, "asof_join",
                                  hot_key_rows)

    out = carried.where(F.col("__side__") == 1)
    if tolerance_sec is not None:
        keep = F.col("__match_t__") >= F.col("__t__") - F.lit(tolerance_sec)
        out = out.withColumn("__c__", F.when(keep, F.col("__c__")))
    proj = keys + [c for c in ldf.columns if c not in keys]
    out = out.select(
        *[_qc(c) for c in proj],
        *[F.col("__c__").getField(c).alias(out_names[c]) for c in r_payload])
    return OmigoDF(out)


def _asof_carry_bucketed(u, keys, tb, span: float,
                         out_c: str = "__c__",
                         out_mt: str = "__match_t__"):
    """Bucketed directional as-of carry over the tagged union ``u``
    (see asof_join): local carry inside (key, time-bucket) windows; a
    per-bucket aggregate picks each bucket's LAST right row — max
    (__t__, tiebreaks) among side=0 rows, exactly the window's winner —
    and a per-key running carry over the (tiny) bucket frame feeds
    rows with no in-bucket match. Buckets partition the (signed) time
    order and equal times share a bucket, so local-order = global-order
    restricted to the bucket and the result is identical to the
    single-window carry. NULL-time left rows land in the NULL bucket,
    which sorts FIRST (no carry-in) — the same nothing-precedes-them
    the NULLS-FIRST window gives."""
    from ..core import colutils

    u2 = u.withColumn("__b__", _time_bucket(F.col("__t__"), span))
    wl = (Window.partitionBy(*_qcs(keys), "__b__")
          .orderBy("__t__", "__side__", *tb)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = u2.select(
        "*",
        F.last("__r__", ignorenulls=True).over(wl).alias("__lc__"),
        F.last(F.when(F.col("__side__") == 0, F.col("__t__")),
               ignorenulls=True).over(wl).alias("__lmt__"))
    # per-bucket final right row: max (t, tiebreaks) among right rows —
    # max_by over a lexicographic struct = the window's last() pick
    summ = (u2.where(F.col("__side__") == 0)
            .groupBy(*_qcs(keys), "__b__")
            .agg(F.max_by(F.col("__r__"),
                          F.struct(F.col("__t__"), *tb)).alias("__lr__"),
                 F.max("__t__").alias("__lt__")))
    buckets = u2.select(*_qcs(keys), "__b__").distinct()

    def _q(side, c):
        return F.col(side + "." + colutils.quote(c))

    bl = buckets.alias("__bl__")
    br = summ.alias("__br__")
    cond = [_q("__bl__", c).eqNullSafe(_q("__br__", c))
            for c in keys + ["__b__"]]
    bf = bl.join(br, on=cond, how="left").select(
        *[_q("__bl__", c).alias(c) for c in keys + ["__b__"]],
        _q("__br__", "__lr__").alias("__lr__"),
        _q("__br__", "__lt__").alias("__lt__"))
    wb = (Window.partitionBy(*_qcs(keys))
          .orderBy(F.col("__b__").asc_nulls_first())
          .rowsBetween(Window.unboundedPreceding, -1))
    carry = bf.select(
        *_qcs(keys), "__b__",
        F.last("__lr__", ignorenulls=True).over(wb).alias("__cin__"),
        F.last("__lt__", ignorenulls=True).over(wb).alias("__cint__"))
    ll = local.alias("__cl__")
    cr = carry.alias("__cr__")
    cond2 = [_q("__cl__", c).eqNullSafe(_q("__cr__", c))
             for c in keys + ["__b__"]]
    keep = [c for c in local.columns if c not in ("__lc__", "__lmt__")]
    return (ll.join(cr, on=cond2, how="inner")
            .select(*[_q("__cl__", c).alias(c) for c in keep],
                    F.coalesce(_q("__cl__", "__lc__"),
                               _q("__cr__", "__cin__")).alias(out_c),
                    F.coalesce(_q("__cl__", "__lmt__"),
                               _q("__cr__", "__cint__"))
                    .alias(out_mt))
            .drop("__b__"))


def _asof_tiebreak(tiebreak_cols, r_payload):
    """Validated window-order suffix for duplicate right (on, time) rows:
    the caller's tiebreak columns read out of the unioned __r__ payload
    struct (present on both sides — a NULL struct on left rows yields
    NULL fields, which the side tag already orders)."""
    if not tiebreak_cols:
        return []
    missing = [c for c in tiebreak_cols if c not in r_payload]
    if missing:
        raise ValueError(
            f"asof_join: tiebreak_cols {missing} are not right-side "
            f"payload columns (have {r_payload})")
    return [F.col("__r__").getField(c) for c in tiebreak_cols]


def _asof_nearest(left, right, on, left_time, right_time, suffix,
                  tolerance_sec, tiebreak_cols=None,
                  time_buckets_sec=None) -> OmigoDF:
    """Nearest-match as-of: both directional carries over ONE union —
    the backward and forward windows share the hash partitioning (one
    Exchange, two Sorts) — then a map-side pick of the closer match
    (ties prefer the backward/earlier row, pandas merge_asof style).

    With ``time_buckets_sec`` the two carries each run through the
    bucketed plan (_asof_carry_bucketed): the forward carry is the
    backward carry on NEGATED time — (-t asc, side, tb) is exactly the
    (t desc, side, tb) window order, and max_by over the negated
    struct picks the same winner — so one helper serves both; the pick
    logic is unchanged."""
    ldf, rdf = _df(left), _df(right)
    keys = [on] if isinstance(on, str) else list(on)
    rt = right_time or left_time
    r_payload = [c for c in rdf.columns if c not in keys]
    # validate tiebreak_cols BEFORE the empty-payload early return (r12
    # advice): asof_join's backward/forward path raises ValueError on
    # invalid tiebreak_cols even when there is nothing to carry, and
    # nearest must not silently accept the same bad input
    tb = _asof_tiebreak(tiebreak_cols, r_payload)
    if not r_payload:
        return OmigoDF(ldf)

    # same atomic struct carry as asof_join (r11 advice fix): one
    # last(ignorenulls) per DIRECTION picks a whole right row, so NULL
    # payload cells in the winning row are never backfilled from an
    # earlier right row
    pay_struct = F.struct(*[_qc(c).alias(c) for c in r_payload])
    r_typed = rdf.select(pay_struct.alias("__r__")).schema["__r__"].dataType
    l_tagged = (ldf.withColumn("__t__", _epoch_sec(ldf, left_time))
                .withColumn("__side__", F.lit(1))
                .withColumn("__r__", F.lit(None).cast(r_typed)))
    # same NULL-time right-row screen as asof_join (there the leak was
    # a phantom match; here the pick logic already masked it, but the
    # rows still rode the shuffle for nothing)
    r_tagged = (rdf.withColumn("__t__", _epoch_sec(rdf, rt))
                .where(F.col("__t__").isNotNull())
                .withColumn("__side__", F.lit(0))
                .withColumn("__r__", pay_struct))
    for c in ldf.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(
                c, F.lit(None).cast(ldf.schema[c].dataType))
    cols = keys + ["__t__", "__side__", "__r__"] \
        + [c for c in ldf.columns if c not in keys]
    u = (l_tagged.select(*[_qc(c) for c in cols])
         .unionByName(r_tagged.select(*[_qc(c) for c in cols])))

    if time_buckets_sec is not None:
        span = float(time_buckets_sec)
        c1 = _asof_carry_bucketed(u, keys, tb, span,
                                  out_c="__bk__", out_mt="__bkt__")
        c1n = c1.withColumn("__t__", -F.col("__t__"))
        c2 = _asof_carry_bucketed(c1n, keys, tb, span,
                                  out_c="__fk__", out_mt="__fkt__")
        carried = (c2.withColumn("__t__", -F.col("__t__"))
                   .select("*",
                           F.col("__bk__").alias("__b__"),
                           F.col("__fk__").alias("__f__"),
                           F.col("__bkt__").alias("__bt__"),
                           (-F.col("__fkt__")).alias("__ft__"))
                   .drop("__bk__", "__fk__", "__bkt__", "__fkt__")
                   .where(F.col("__side__") == 1))
    else:
        frame = (Window.unboundedPreceding, Window.currentRow)
        # tiebreak ASC in BOTH windows: among equal-time right rows,
        # last() picks the max tiebreak tuple in each direction, so the
        # backward and forward carries agree on the winner of a tie
        wb = (Window.partitionBy(*_qcs(keys))
              .orderBy("__t__", "__side__", *tb)
              .rowsBetween(*frame))
        wf = (Window.partitionBy(*_qcs(keys))
              .orderBy(F.col("__t__").desc(), "__side__", *tb)
              .rowsBetween(*frame))
        sel = ["*",
               F.last("__r__", ignorenulls=True).over(wb).alias("__b__"),
               F.last("__r__", ignorenulls=True).over(wf).alias("__f__")]
        rt_col = F.when(F.col("__side__") == 0, F.col("__t__"))
        sel.append(F.last(rt_col, ignorenulls=True).over(wb).alias("__bt__"))
        sel.append(F.last(rt_col, ignorenulls=True).over(wf).alias("__ft__"))
        carried = u.select(*sel).where(F.col("__side__") == 1)

    bd = F.col("__t__") - F.col("__bt__")
    fd = F.col("__ft__") - F.col("__t__")
    # a NULL-TIME left row can be "near" nothing: without this screen
    # it sorts LAST in the forward (desc) window, sees every right row,
    # and phantom-matches the EARLIEST one in the no-tolerance case —
    # the same silent-wrong class as the r10 NULL-time-right fix
    # (surfaced r12 when the bucketed carry, whose NULL bucket sorts
    # first in both directions, correctly produced no match)
    t_ok = F.col("__t__").isNotNull()
    if tolerance_sec is not None:
        b_ok = t_ok & F.col("__bt__").isNotNull() & (bd <= F.lit(tolerance_sec))
        f_ok = t_ok & F.col("__ft__").isNotNull() & (fd <= F.lit(tolerance_sec))
    else:
        b_ok = t_ok & F.col("__bt__").isNotNull()
        f_ok = t_ok & F.col("__ft__").isNotNull()
    use_b = b_ok & (~f_ok | (bd <= fd))   # tie -> backward
    proj = keys + [c for c in ldf.columns if c not in keys]
    pick = F.when(use_b, F.col("__b__")).when(f_ok, F.col("__f__"))
    out = carried.select(
        *[_qc(c) for c in proj],
        *[pick.getField(c).alias(f"{suffix}:{c}") for c in r_payload])
    return OmigoDF(out)


def range_join(points, intervals, point_col: str, start_col: str,
               end_col: str, on: list[str] | None = None,
               bin_width: float = 86400.0, how: str = "inner") -> OmigoDF:
    """Join point rows to interval rows where
    ``start <= point <= end`` (plus optional equi-keys ``on``).

    Distributed strategy: quantize. Points get one bin
    ``floor(point / bin_width)``; intervals explode to every bin they
    overlap; the join is a plain equi-join on (keys, bin) and the exact
    range predicate rides IN the join condition (not a post-join filter,
    which would silently drop a left join's unmatched NULL rows and
    degrade it to inner). Duplicate hits (an interval spans many bins
    but each point lives in exactly one) cannot occur: each point
    carries a single bin.

    ``how`` is 'inner' or 'left' (points-preserving). 'right'/'full'
    are rejected: bin explosion duplicates an unmatched interval once
    per bin it spans; call with the sides swapped instead.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"range_join: how={how!r} unsupported — bin explosion would "
            "duplicate unmatched intervals; use 'inner' or 'left' "
            "(swap sides for an interval-preserving join)")
    pdf, idf = _df(points), _df(intervals)
    keys = list(on or [])
    # reject shared non-key names up front (the __join rule): the output
    # would carry duplicate column names that break every by-name select
    # downstream, and the range predicate would be ambiguous to compile
    dup_names = [c for c in idf.columns
                 if c in set(pdf.columns) and c not in keys]
    if dup_names:
        raise ValueError(
            f"range_join: columns {dup_names} exist on both sides — only "
            "the equi-keys `on` may be shared; rename one side first")

    # alias-qualified QUOTED refs, not the bracket accessor (p[k] PARSES
    # the name — a dot or backtick in a user column breaks; r13
    # hostile-name sweep)
    from ..core import colutils

    def _q(side, c):
        return F.col(side + "." + colutils.quote(c))

    p = pdf.withColumn(
        "__bin__", F.floor(_epoch_sec(pdf, point_col) / bin_width)) \
        .alias("__rp__")
    i = idf.withColumn(
        "__bin__",
        F.explode(F.sequence(
            F.floor(_epoch_sec(idf, start_col) / bin_width),
            F.floor(_epoch_sec(idf, end_col) / bin_width)))) \
        .alias("__ri__")

    cond = [_q("__rp__", "__bin__") == _q("__ri__", "__bin__")]
    for k in keys:
        cond.append(_q("__rp__", k) == _q("__ri__", k))
    pt = _epoch_sec(pdf, point_col, _q("__rp__", point_col))
    cond.append(pt >= _epoch_sec(idf, start_col, _q("__ri__", start_col)))
    cond.append(pt <= _epoch_sec(idf, end_col, _q("__ri__", end_col)))
    joined = p.join(i, cond, how)
    dup = set(keys) | {"__bin__"}
    out = joined.select(
        *[_q("__rp__", c).alias(c) for c in pdf.columns],
        *[_q("__ri__", c).alias(c) for c in idf.columns if c not in dup])
    return OmigoDF(out)


AUTO_HOT_KEY_ROWS = 262_144


# Below this row threshold the census is NOT provably small (threshold=1
# makes it every distinct key), so the explicit broadcast hint — which
# bypasses AQE's size check and can OOM the driver — is withheld and AQE
# decides from the materialized size (r12 advice).
BROADCAST_HINT_MIN_THRESHOLD = 1024


def _watch_hot_keys(df, w_base, op_name: str, hot_key_rows):
    """Default-on hot-key detector for the PLAIN single-window carries
    (r13 verdict #3, via the observe() design r14 verdict #5 asked for):
    a row_number over the SAME partition/order rides the op's existing
    Window evaluation (zero extra jobs or scans at construct OR action),
    its global max rides the caller's first action as an observe()
    metric, and a shared daemon poller warns — naming time_buckets_sec
    as the remedy — when any key group reaches the census threshold.
    ``hot_key_rows=None`` disables the watch (matching its meaning on
    the bucketed path: no hot/cold routing)."""
    if hot_key_rows is None:
        return df
    thr = (AUTO_HOT_KEY_ROWS if hot_key_rows == "auto"
           else int(hot_key_rows))

    def _cb(m):
        mx = m.get("max_key_rows")
        if mx is not None and mx >= thr:
            import warnings
            warnings.warn(
                f"{op_name}: a key group holds {mx:,} rows (threshold "
                f"{thr:,}) — the ordered carry runs it in ONE task, the "
                f"shuffle-skew class AQE cannot split; pass "
                f"time_buckets_sec=... to run hot keys bucketed",
                RuntimeWarning, stacklevel=2)

    from ..core.jobs import observe_async
    out = df.withColumn("__hk_rn__", F.row_number().over(w_base))
    out = observe_async(out, {"max_key_rows": F.max("__hk_rn__")}, _cb)
    return out.drop("__hk_rn__")


def _hot_key_split(d, keys, threshold: int, hot_keys=None):
    """(hot_rows, cold_rows): rows whose key holds >= threshold rows vs
    the rest. One partial-aggregated census + a null-safe semi/anti
    join (NULL keys are real groups and can be hot — plain `on=`
    equality would silently misroute them to cold). The broadcast hint
    applies only when ``threshold`` bounds the census to <= n/1024 keys;
    below that AQE picks the strategy from the census's real size. Pass
    a precomputed ``hot_keys`` frame to split several inputs by the SAME
    key set (asof splits left and right by the combined census). The
    probe side ``d`` is still scanned once by each of the two joins —
    callers with an expensive upstream plan (not a plain scan) should
    persist/localCheckpoint it before routing; the census itself is
    localCheckpointed so its aggregation runs exactly once."""
    from ..core import colutils
    if hot_keys is None:
        hot_keys = _hot_keys_census(d, keys, threshold)
    dl = d.alias("__dd__")
    hk = hot_keys.alias("__hk__")
    if threshold >= BROADCAST_HINT_MIN_THRESHOLD:
        hk = F.broadcast(hk)
    cond = [F.col("__dd__." + colutils.quote(c)).eqNullSafe(
        F.col("__hk__." + colutils.quote(c))) for c in keys]
    return dl.join(hk, on=cond, how="left_semi"), \
        dl.join(hk, on=cond, how="left_anti")


def _hot_keys_census(d, keys, threshold: int):
    # localCheckpoint: the census feeds 2-4 semi/anti joins (4 for asof's
    # shared left+right split) — without it each join re-evaluates the
    # full input lineage through the aggregation (r12 advice). Bounded
    # output (<= n/threshold keys), so materializing is cheap. EAGER on
    # purpose (r14 adjudication): a lazy census is first materialized
    # UNDER its multiple consumer joins inside one action, which read
    # consistently slower (+5..+14%) in clean-box isolated A/B than
    # materializing once up front; the construct-time job it costs is
    # census-sized, not input-sized.
    return (d.groupBy(*_qcs(keys)).agg(F.count(F.lit(1)).alias("__kc__"))
            .where(F.col("__kc__") >= F.lit(int(threshold)))
            .select(*_qcs(keys))
            .localCheckpoint())


def sessionize(odf, key_cols: list[str] | str, time_col: str,
               gap_sec: float = 1800.0,
               session_col: str = "session_id",
               time_buckets_sec: float | None = None,
               hot_key_rows: int | str | None = "auto") -> OmigoDF:
    """Assign gap-based session numbers per key: a new session starts
    whenever the time since the previous event exceeds ``gap_sec``.
    Adds ``{session_col}`` (1-based per key) — one shuffle on the key,
    both window functions share the same sort order.

    ``time_buckets_sec`` (r12, the hot-key scale path): a window
    partitioned by a SKEWED key puts the whole hot group in ONE task —
    the one shuffle-skew class AQE cannot split (measured 2.1× at 30%
    skew on the r12 skew probe; at 100 TB the hot key is a straggler
    that never finishes). Passing a bucket span switches to an exact
    two-phase plan: (1) sessionize WITHIN (key, time-bucket) windows —
    parallelism = buckets per key, so the hot key spreads over
    span/bucket tasks; (2) a per-(key, bucket) summary (first/last
    event time, local session count) merges sessions across bucket
    boundaries on a bucket-counted frame orders of magnitude smaller
    than the data; (3) one join back on (key, bucket) — which reuses
    the phase-1 exchange, so the big side never reshuffles. The result
    is IDENTICAL to the single-window plan (property-tested, including
    NULL times and boundary-straddling sessions); pick a span well
    above ``gap_sec`` so most sessions close within one bucket.

    ``hot_key_rows`` routes ONLY hot keys through the bucketed plan
    (default ``"auto"`` = 262,144 rows): a one-pass key census splits
    the input, cold keys take the plain single-window plan (their
    partitions are small — bucketing them is pure overhead and, for
    rolling, trips the density guard), hot keys take the two-phase
    plan, results union. ``None`` buckets every key; an int pins the
    threshold. Without ``time_buckets_sec`` the same threshold instead
    arms a zero-extra-job hot-key WARNING on the single-window plan
    (r15): a row counter rides the existing window pass, its max rides
    the caller's first action as an observe() metric, and a key group
    at/over the threshold warns asynchronously naming
    ``time_buckets_sec`` as the remedy (``None`` disables)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    d = _df(odf)
    t: Column = _epoch_sec(d, time_col)
    if time_buckets_sec is None:
        # the order key is MATERIALIZED as a column before the windows
        # (r15): ordering by the raw epoch-cast EXPRESSION gave every
        # Window node its own internal `_w0` projection, so the lag,
        # running-sum and hot-key-counter windows each paid a separate
        # Sort pass and never collapsed (plan: 3 Sort + 3 Window).
        # Over a real column the specs share attributes: one Sort, the
        # counter fuses into the running-sum Window (CollapseWindow),
        # and the values — hence results — are identical.
        w = Window.partitionBy(*_qcs(keys)).orderBy("__ot__")
        ot = F.col("__ot__")
        is_break = (ot - F.lag(ot).over(w) > F.lit(gap_sec)).cast("bigint")
        out = (d.withColumn("__ot__", t)
               .withColumn("__brk__", F.coalesce(is_break, F.lit(0)))
               .withColumn(session_col,
                           (F.sum("__brk__").over(
                               w.rowsBetween(Window.unboundedPreceding,
                                             Window.currentRow)) + 1)))
        out = _watch_hot_keys(out, w, "sessionize", hot_key_rows)
        return OmigoDF(out.drop("__brk__", "__ot__"))
    if time_buckets_sec <= 0:
        raise ValueError("sessionize: time_buckets_sec must be positive")
    if hot_key_rows is not None:
        thr = AUTO_HOT_KEY_ROWS if hot_key_rows == "auto" else int(hot_key_rows)
        hot, cold = _hot_key_split(d, keys, thr)
        hot_out = sessionize(OmigoDF(hot), keys, time_col, gap_sec,
                             session_col, time_buckets_sec,
                             hot_key_rows=None)
        cold_out = sessionize(OmigoDF(cold), keys, time_col, gap_sec,
                              session_col, time_buckets_sec=None)
        return OmigoDF(hot_out.df.unionByName(cold_out.df))
    cols = list(d.columns)
    # NULL times bucket to NULL, which sorts FIRST over the bucket
    # order exactly as NULL t sorts first in the single-window plan;
    # their NULL boundary gaps read as "continue" in both plans.
    d2 = (d.withColumn("__t__", t)
          .withColumn("__b__", _time_bucket(F.col("__t__"),
                                           float(time_buckets_sec))))
    wl = Window.partitionBy(*_qcs(keys), "__b__").orderBy("__t__")
    brk = (F.col("__t__") - F.lag("__t__").over(wl)
           > F.lit(gap_sec)).cast("bigint")
    local = (d2.withColumn("__brk__", F.coalesce(brk, F.lit(0)))
             .withColumn("__lid__", F.sum("__brk__").over(
                 wl.rowsBetween(Window.unboundedPreceding,
                                Window.currentRow)) + 1))
    summ = (local.groupBy(*_qcs(keys), "__b__")
            .agg(F.min("__t__").alias("__ft__"),
                 F.max("__t__").alias("__lt__"),
                 F.max("__lid__").alias("__ns__")))
    ws = Window.partitionBy(*_qcs(keys)).orderBy(F.col("__b__").asc_nulls_first())
    has_prev = F.lag(F.lit(1)).over(ws).isNotNull()
    # boundary gap NULL (either side's time NULL) = continue, matching
    # the single-window plan's NULL-gap-is-not-a-break rule
    gap_break = F.col("__ft__") - F.lag("__lt__").over(ws) > F.lit(gap_sec)
    merge = F.when(has_prev & ~F.coalesce(gap_break, F.lit(False)),
                   F.lit(1)).otherwise(F.lit(0))
    summ = (summ.withColumn("__mrg__", merge)
            .withColumn("__P__", F.coalesce(
                F.sum(F.col("__ns__") - F.col("__mrg__")).over(
                    ws.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0))))
    # null-safe aliased join back: plain `on=` equality would DROP the
    # NULL-key / NULL-bucket groups the single-window plan keeps, and
    # summ derives from local so bare column refs would be ambiguous
    from ..core import colutils
    lhs = local.alias("__sl__")
    rhs = summ.select(*_qcs(keys), "__b__", "__mrg__", "__P__").alias("__sr__")

    def _q(side, c):
        return F.col(side + "." + colutils.quote(c))

    cond = [_q("__sl__", c).eqNullSafe(_q("__sr__", c))
            for c in keys + ["__b__"]]
    joined = lhs.join(rhs, on=cond, how="inner")
    out = joined.withColumn(
        session_col,
        _q("__sr__", "__P__") + _q("__sl__", "__lid__")
        - _q("__sr__", "__mrg__")) \
        .select(*[_q("__sl__", c).alias(c) for c in cols], _qc(session_col))
    return OmigoDF(out)


def rolling_aggregate(odf, key_cols: list[str] | str, order_col: str,
                      agg_cols, agg_funcs, window_rows: int = 5,
                      precision: int = 6,
                      tiebreak_cols: list[str] | None = None,
                      time_buckets_sec: float | None = None,
                      hot_key_rows: int | str | None = "auto") -> OmigoDF:
    """Per-key rolling-window features over the trailing ``window_rows``
    rows (current row inclusive) in ``order_col`` order — the moving
    mean/min/max/sum shape of time-series feature engineering.

    One shuffle on the key; every requested aggregate shares the same
    window frame, so Catalyst plans a single Exchange+Sort+Window.
    Output columns: ``<col>:rolling_<func>``. Sums/means go through
    DECIMAL so results are add-order deterministic.

    A ROW-based frame over a non-total order is partition-order
    dependent: rows sharing an ``order_col`` value can enter the frame
    in either order, so their rolling values may differ between runs
    (r10 review). Pass ``tiebreak_cols`` — columns completing a total
    order per key — when ``(key, order_col)`` can repeat; with the
    default None the caller asserts the order is already total.

    ``time_buckets_sec`` (r12, the hot-key scale path — same hazard as
    sessionize: a window partitioned by a skewed key is ONE task, the
    shuffle-skew class AQE cannot split; measured 2.4× at 30% skew on
    the r12 skew probe). Passing a bucket span runs the window inside
    (key, time-bucket) partitions with a HALO: the last
    ``window_rows - 1`` rows of each bucket are replicated into the
    key's NEXT non-empty bucket (successor by per-key bucket order, so
    empty buckets cannot break the chain), the frame is computed over
    local+halo rows, and halo outputs are dropped. Exact — identical
    to the single-window plan (property-tested) — PROVIDED every
    interior bucket holds at least ``window_rows - 1`` rows, which one
    cheap summary check enforces (raises with the pick-a-bigger-span
    remedy otherwise; a boundary row would silently miss predecessors
    two buckets back). Ties never straddle buckets (equal times share
    a bucket), so the tiebreak contract is unchanged.

    ``hot_key_rows`` (default ``"auto"`` = 262,144 rows) routes only
    hot keys through the halo plan via a one-pass key census — cold
    keys' partitions are small (no straggler to fix) and their sparse
    buckets would trip the density guard; they keep the single-window
    plan, and the two results union. ``None`` buckets every key.
    Without ``time_buckets_sec`` the threshold instead arms the
    zero-extra-job hot-key warning on the single-window plan (r15 —
    see sessionize)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    d = _df(odf)
    if time_buckets_sec is not None:
        if time_buckets_sec <= 0:
            raise ValueError("rolling_aggregate: time_buckets_sec must "
                             "be positive")
        if hot_key_rows is not None:
            thr = (AUTO_HOT_KEY_ROWS if hot_key_rows == "auto"
                   else int(hot_key_rows))
            hot, cold = _hot_key_split(d, keys, thr)
            hot_out = rolling_aggregate(
                OmigoDF(hot), keys, order_col, agg_cols, agg_funcs,
                window_rows, precision, tiebreak_cols,
                time_buckets_sec, hot_key_rows=None)
            cold_out = rolling_aggregate(
                OmigoDF(cold), keys, order_col, agg_cols, agg_funcs,
                window_rows, precision, tiebreak_cols,
                time_buckets_sec=None)
            return OmigoDF(hot_out.df.unionByName(cold_out.df))
        return _rolling_bucketed(d, keys, order_col, agg_cols, agg_funcs,
                                 window_rows, precision, tiebreak_cols,
                                 float(time_buckets_sec))
    # order key materialized as a column (r15, see sessionize): an
    # expression orderBy denies Sort sharing and Window collapse, so
    # the hot-key counter would pay its own Sort + Window pass
    order = [F.col("__ot__")] + [_qc(c) for c in (tiebreak_cols or [])]
    w_base = Window.partitionBy(*_qcs(keys)).orderBy(*order)
    w = w_base.rowsBetween(-(window_rows - 1), Window.currentRow)
    out = d.withColumn("__ot__", _epoch_sec(d, order_col))
    for name, expr in _rolling_exprs(w, agg_cols, agg_funcs, precision):
        out = out.withColumn(name, expr)
    return OmigoDF(_watch_hot_keys(out, w_base, "rolling_aggregate",
                                   hot_key_rows).drop("__ot__"))


def _rolling_exprs(w, agg_cols, agg_funcs, precision):
    """(name, expr) pairs for the rolling aggregates over window ``w``
    — shared by the single-window and bucketed plans so both compute
    the literally identical expressions."""
    res = []
    for c, fn in zip(list(agg_cols), list(agg_funcs)):
        x = _qc(c).try_cast("double")
        xd = _qc(c).try_cast("decimal(28,8)")
        # overflow guard (the normalize() rule): a value that parses as
        # double but overflows DECIMAL(28,8) NULLs out of the window sum
        # while count(x) still includes it — the sum/mean would be
        # silently wrong. Fail loudly instead.
        overflow = ((F.count(x).over(w) > F.count(xd).over(w))
                    | (F.sum(xd).over(w).isNull()
                       & (F.count(xd).over(w) > 0)))
        boom = F.raise_error(F.lit(
            f"rolling_aggregate: decimal overflow on column '{c}' "
            "(|x| too large for DECIMAL(28,8)) — pre-scale the column"
        )).cast("double")
        if fn == "mean":
            expr = F.when(overflow, boom).otherwise(
                F.round((F.sum(xd).over(w).cast("double")
                         / F.count(x).over(w)), precision))
        elif fn == "sum":
            expr = F.when(overflow, boom).otherwise(
                F.round(F.sum(xd).over(w).cast("double"), precision))
        elif fn == "min":
            expr = F.min(x).over(w)
        elif fn == "max":
            expr = F.max(x).over(w)
        elif fn == "count":
            expr = F.count(x).over(w)
        else:
            raise ValueError(f"rolling_aggregate: unknown func: {fn}")
        res.append((f"{c}:rolling_{fn}", expr))
    return res


def _rolling_bucketed(d, keys, order_col, agg_cols, agg_funcs,
                      window_rows, precision, tiebreak_cols,
                      span: float) -> OmigoDF:
    """Halo two-phase rolling (see rolling_aggregate docstring): local
    windows inside (key, time-bucket) partitions, with each bucket's
    last ``window_rows - 1`` rows replicated into the key's successor
    bucket so boundary frames are complete; halo outputs dropped."""
    from ..core import colutils
    if span <= 0:
        raise ValueError("rolling_aggregate: time_buckets_sec must be "
                         "positive")
    cols = list(d.columns)
    d2 = (d.withColumn("__t__", _epoch_sec(d, order_col))
          .withColumn("__b__", _time_bucket(F.col("__t__"), span)))
    summ = d2.groupBy(*_qcs(keys), "__b__").agg(F.count(F.lit(1)).alias("__cnt__"))
    ws = Window.partitionBy(*_qcs(keys)).orderBy(F.col("__b__").asc_nulls_first())
    summ = (summ.withColumn("__nxt__", F.lead("__b__").over(ws))
            .withColumn("__haspred__",
                        F.lag(F.lit(1)).over(ws).isNotNull()))
    if window_rows > 1:
        # exactness guard: a boundary frame reaches at most one bucket
        # back through the halo, so every INTERIOR bucket (one with
        # both a predecessor and a successor) must hold >= W-1 rows —
        # otherwise the first rows of its successor would silently
        # miss predecessors from two buckets back.
        # The guard rides IN-PLAN (r14): the old construct-time
        # limit(1).count() probe was a separate full-input aggregation
        # job whose result nothing reused — one extra pass over the
        # input per call. As a broadcast 1-row scalar it shares the
        # summary's groupBy exchange with the main plan
        # (ReusedExchange) and raises when its broadcast stage
        # materializes (raise-parity with the nb_classify/dsir/
        # mix_sources in-plan guards). The fold point is the FINAL
        # halo-drop filter, not the halo join's __nxt__: under count()
        # column pruning collapses the windows, the __halo__==0 filter
        # then pushes into the union and constant-folds the halo
        # branch (__halo__=lit(1)) to an empty relation, pruning the
        # whole join subtree — a guard riding there silently vanishes
        # (observed). The final filter decides output cardinality, so
        # NO action can prune it; `__halo__ + __bad__ == 0` is
        # data-dependent on both sides of the crossJoin and cannot be
        # split or folded. The `+ __bad__` fold is an identity on
        # every surviving plan (__bad__ == 0).
        bad = (summ.where(F.col("__haspred__")
                          & F.col("__nxt__").isNotNull()
                          & (F.col("__cnt__") < F.lit(window_rows - 1)))
               .agg(F.count(F.lit(1)).alias("__bad__"))
               .select(F.when(F.col("__bad__") == 0, F.col("__bad__"))
                       .otherwise(F.raise_error(F.lit(
                           "rolling_aggregate: time_buckets_sec too "
                           "small — an interior (key, bucket) holds "
                           f"fewer than window_rows-1={window_rows - 1} "
                           "rows, so a bucket-boundary frame would be "
                           "silently incomplete; increase "
                           "time_buckets_sec")))
                       .alias("__bad__")))
    else:
        bad = None
    order_local = [F.col("__t__")] + [_qc(c)
                                      for c in (tiebreak_cols or [])]
    wdesc = Window.partitionBy(*_qcs(keys), "__b__").orderBy(
        *[o.desc() for o in order_local])
    halo_src = (d2.withColumn("__rdesc__", F.row_number().over(wdesc))
                .where(F.col("__rdesc__") <= F.lit(window_rows - 1))
                .drop("__rdesc__"))

    def _q(side, c):
        return F.col(side + "." + colutils.quote(c))

    lhs = halo_src.alias("__hl__")
    rhs = summ.select(*_qcs(keys), "__b__", "__nxt__").alias("__hr__")
    cond = [_q("__hl__", c).eqNullSafe(_q("__hr__", c))
            for c in keys + ["__b__"]]
    halo = (lhs.join(rhs, on=cond, how="inner")
            .where(_q("__hr__", "__nxt__").isNotNull())
            .select(*[_q("__hl__", c).alias(c) for c in cols + ["__t__"]],
                    _q("__hr__", "__nxt__").alias("__b__"))
            .withColumn("__halo__", F.lit(1)))
    ucols = cols + ["__t__", "__b__", "__halo__"]
    u = (d2.withColumn("__halo__", F.lit(0)).select(*[_qc(c) for c in ucols])
         .unionByName(halo.select(*[_qc(c) for c in ucols])))
    wu = (Window.partitionBy(*_qcs(keys), "__b__").orderBy(*order_local)
          .rowsBetween(-(window_rows - 1), Window.currentRow))
    out = u
    for name, expr in _rolling_exprs(wu, agg_cols, agg_funcs, precision):
        out = out.withColumn(name, expr)
    if bad is not None:
        out = (out.crossJoin(F.broadcast(bad))
               .where((F.col("__halo__") + F.col("__bad__")) == 0)
               .drop("__t__", "__b__", "__halo__", "__bad__"))
    else:
        out = (out.where(F.col("__halo__") == 0)
               .drop("__t__", "__b__", "__halo__"))
    return OmigoDF(out)


def merge_intervals(odf, key_cols: list[str] | str, start_col: str,
                    end_col: str,
                    time_buckets_sec: float | None = None,
                    hot_key_rows: int | str | None = "auto") -> OmigoDF:
    """Union overlapping/touching [start, end] intervals per key into
    maximal disjoint islands (gaps-and-islands): one output row per
    island with its bounds and member count.

    Window plan: order intervals by (start, end), carry the running max
    end; an island starts where start > max(previous ends); the island
    number is the running sum of those breaks. Both windows and the
    final collapse share one hash partitioning on the key.

    ``time_buckets_sec`` (r13, the hot-key scale path — same straggler
    as sessionize/rolling/asof: a window partitioned by a skewed key is
    ONE task, the shuffle-skew class AQE cannot split): buckets rows by
    ``floor(start / span)`` and runs the carry in two exact phases. The
    running max-end is ASSOCIATIVE, so a per-(key, bucket) summary
    (max end) rolls up into a per-key running carry-in over the tiny
    bucket frame; joined back on (key, bucket) — reusing the phase-1
    exchange — it recomputes every break against
    ``greatest(local_prev_max_end, carry_in)``, which equals the
    single window's full-prefix max exactly. Island numbers come from
    the sessionize-style prefix sum: per-bucket break counts prefix-
    summed over the bucket frame + the in-bucket running break count.
    Exact for ANY bucket span (no density requirement — an interval
    spanning many buckets is covered by the running max); equal starts
    share a bucket, so tie order is untouched. Property-tested
    bit-identical to the single-window plan.

    ``hot_key_rows`` (default ``"auto"`` = 262,144 rows) routes only
    hot keys through the bucketed plan via the shared key census; cold
    keys keep the plain plan and the outputs union. ``None`` buckets
    every key. Without ``time_buckets_sec`` the threshold instead arms
    the zero-extra-job hot-key warning on the single-window plan (r15 —
    see sessionize)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    d = _df(odf)

    # canonicalize -0.0 -> +0.0 on ingest (r14 parity-hunt find): Spark's
    # min/max keep the FIRST-SEEN of an IEEE-equal pair, so an island
    # holding both -0.0 and 0.0 starts would report island_start as
    # whichever representative the accumulation order met first — a
    # plan-shape-dependent output that made the bucketed two-phase plan
    # diverge from the plain window plan on str()-level canon (trial 21,
    # tools/parity_hunt.py). The WHEN guard (not `+ 0.0`, which a future
    # identity-fold could erase) maps both zeros to +0.0 and leaves
    # NULL/NaN/±Inf untouched; comparisons are unaffected (-0.0 == 0.0
    # already), only the emitted representative becomes deterministic.
    def _c0(c):
        return F.when(c == F.lit(0.0), F.lit(0.0)).otherwise(c)

    s = _c0(_qc(start_col).cast("double"))
    e = _c0(_qc(end_col).cast("double"))
    if time_buckets_sec is not None:
        if time_buckets_sec <= 0:
            raise ValueError("merge_intervals: time_buckets_sec must be "
                             "positive")
        if hot_key_rows is not None:
            thr = (AUTO_HOT_KEY_ROWS if hot_key_rows == "auto"
                   else int(hot_key_rows))
            hot, cold = _hot_key_split(d, keys, thr)
            hot_out = merge_intervals(OmigoDF(hot), keys, start_col,
                                      end_col, time_buckets_sec,
                                      hot_key_rows=None)
            cold_out = merge_intervals(OmigoDF(cold), keys, start_col,
                                       end_col, time_buckets_sec=None)
            return OmigoDF(hot_out.df.unionByName(cold_out.df))
        return _merge_intervals_bucketed(d, keys, s, e,
                                         float(time_buckets_sec))
    # order keys materialized as columns (r15, see sessionize): ordering
    # by the canonicalized-double EXPRESSIONS denied Sort sharing and
    # Window collapse — the prev-max, running-sum and hot-key-counter
    # windows each paid their own Sort pass. The aggregates read the
    # same materialized values, so results are identical.
    s0, e0 = F.col("__s0__"), F.col("__e0__")
    w = Window.partitionBy(*_qcs(keys)).orderBy(s0, e0)
    prev_max_end = F.max(e0).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    brk = (F.when(prev_max_end.isNull() | (s0 > prev_max_end), 1)
           .otherwise(0))
    tagged = (d.withColumn("__s0__", s).withColumn("__e0__", e)
              .withColumn("__brk__", brk)
              .withColumn("__island__",
                          F.sum("__brk__").over(
                              w.rowsBetween(Window.unboundedPreceding,
                                            Window.currentRow)))
              .drop("__brk__"))
    tagged = _watch_hot_keys(tagged, w, "merge_intervals", hot_key_rows)
    return OmigoDF(
        tagged.groupBy(*_qcs(keys), "__island__")
        .agg(F.min(s0).alias("island_start"),
             F.max(e0).alias("island_end"),
             F.count(F.lit(1)).alias("n_intervals"))
        .withColumnRenamed("__island__", "island_id"))


def _merge_intervals_bucketed(d, keys, s, e, span: float) -> OmigoDF:
    """Exact two-phase gaps-and-islands (see merge_intervals): local
    windows only ever partition by (key, time-bucket); cross-bucket
    state is a per-bucket (max end, break count) summary frame orders
    of magnitude smaller than the data. NULL starts land in the NULL
    bucket, which sorts first — the same place the single window's
    NULLS-FIRST order puts them."""
    from ..core import colutils

    def _q(side, c):
        return F.col(side + "." + colutils.quote(c))

    # phase 1: ONE stacked window evaluation computes the local prefix-
    # max of ends, the LOCAL break flag (break ignoring cross-bucket
    # carry) and the local running break count, all over the same
    # Exchange+Sort on (key, bucket). Every window touching data rows
    # lives HERE, before the carry-in join — r14: previously __pme__ was
    # evaluated pre-join and the __lid__ running sum post-join, so for
    # duplicate (s, e) rows the pairing of a break flag with its
    # running-sum position relied on the join incidentally preserving
    # tie order; now the global island id is pure per-row arithmetic
    # after the joins (see below), so tie pairing is structural.
    d2 = (d.withColumn("__s__", s).withColumn("__e__", e)
          .withColumn("__b__", _time_bucket(F.col("__s__"), span)))
    wl = Window.partitionBy(*_qcs(keys), "__b__").orderBy("__s__", "__e__")
    pme = F.max("__e__").over(wl.rowsBetween(Window.unboundedPreceding, -1))
    local = (d2.withColumn(
                 "__lbrk__",
                 F.when(pme.isNull() | (F.col("__s__") > pme), 1)
                 .otherwise(0))
             .withColumn("__L__", F.sum("__lbrk__").over(
                 wl.rowsBetween(Window.unboundedPreceding,
                                Window.currentRow))))
    # carry-in: running max of bucket max-ends over the bucket frame.
    # The summary groups the WINDOWED frame so its aggregation reuses
    # the phase-1 exchange (no second scan of the input); the per-bucket
    # break count nlb rides the SAME aggregate (r15 — it only needs
    # phase-1 columns, so it no longer waits for the carry-in join).
    summ = local.groupBy(*_qcs(keys), "__b__").agg(
        F.max("__e__").alias("__me__"),
        F.sum("__lbrk__").alias("__nlb__"))
    ws = Window.partitionBy(*_qcs(keys)).orderBy(F.col("__b__").asc_nulls_first())
    summ = summ.withColumn(
        "__cin__", F.max("__me__").over(
            ws.rowsBetween(Window.unboundedPreceding, -1)))
    # A row is a GLOBAL break iff s > greatest(local prefix-max, carry-
    # in), i.e. iff it is a local break AND s > cin (cin constant per
    # bucket; greatest() skips NULLs, so cin NULL leaves local breaks
    # untouched). Because rows are s-sorted, the suppressed local breaks
    # (s <= cin) form a PREFIX of the bucket's break rows; with
    # K = |suppressed|, the global running break count at a row is
    # L - least(L, K) — per-row arithmetic, no post-join window.
    #
    # K itself needs only the BREAK rows (r15 — r13 #7): the last
    # suppressed break is the K-th break, so K = max(L | lbrk=1,
    # s <= cin), 0 when none. Joining cin onto the breaks-only
    # projection (which reuses the phase-1 exchange) and re-aggregating
    # is break-count-sized work, so the data-level carry-in join of the
    # old shape disappears: ONE row-level summary join remains (below).
    bcond = [_q("__bl__", c).eqNullSafe(_q("__br__", c))
             for c in keys + ["__b__"]]
    breaks = (local.where(F.col("__lbrk__") == 1)
              .select(*_qcs(keys), "__b__", "__s__", "__L__")
              .alias("__bl__"))
    cinr = summ.select(*_qcs(keys), "__b__", "__cin__",
                       "__nlb__").alias("__br__")
    # every non-empty bucket's first row is a local break (its in-bucket
    # prefix-max is NULL), so this breaks-side aggregation covers every
    # summary bucket and IS the summary: nlb (constant per bucket) rides
    # the same groupBy via max(), so summ is referenced exactly once.
    summary = (breaks.join(cinr, on=bcond, how="inner")
               .groupBy(*[_q("__bl__", c) for c in keys],
                        _q("__bl__", "__b__"))
               .agg(F.coalesce(
                   F.max(F.when(F.col("__s__") <= F.col("__cin__"),
                                F.col("__L__"))),
                   F.lit(0)).alias("__K__"),
                   F.max("__nlb__").alias("__nlb__")))
    # island id = per-key GLOBAL break count over earlier buckets (the
    # prefix of nlb - K) + the in-bucket global running break count
    summary = summary.withColumn(
        "__P__", F.coalesce(F.sum(F.col("__nlb__") - F.col("__K__")).over(
            ws.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)))
    cond2 = [_q("__il__", c).eqNullSafe(_q("__ir__", c))
             for c in keys + ["__b__"]]
    ilhs = local.alias("__il__")
    irhs = summary.select(*_qcs(keys), "__b__", "__P__", "__K__").alias("__ir__")
    numbered = (ilhs.join(irhs, on=cond2, how="inner")
                .withColumn("__island__",
                            _q("__ir__", "__P__") + _q("__il__", "__L__")
                            - F.least(_q("__il__", "__L__"),
                                      _q("__ir__", "__K__"))))
    return OmigoDF(
        numbered.groupBy(*[_q("__il__", k).alias(k) for k in keys],
                         "__island__")
        .agg(F.min(_q("__il__", "__s__")).alias("island_start"),
             F.max(_q("__il__", "__e__")).alias("island_end"),
             F.count(F.lit(1)).alias("n_intervals"))
        .withColumnRenamed("__island__", "island_id"))


def session_stats(odf, key_cols: list[str] | str, time_col: str,
                  gap_sec: float = 1800.0,
                  time_buckets_sec: float | None = None,
                  hot_key_rows: int | str | None = "auto") -> OmigoDF:
    """Sessionize then collapse: one row per (key, session) with start,
    end, duration and event count. The groupBy re-uses the sessionize
    shuffle keys, so AQE keeps the second exchange local.
    ``time_buckets_sec`` / ``hot_key_rows`` pass through to sessionize's
    hot-key scale path (r13 — the collapse itself is partial-aggregated
    and skew-free; only the sessionize carry needed the two-phase plan)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    s = sessionize(odf, keys, time_col, gap_sec,
                   time_buckets_sec=time_buckets_sec,
                   hot_key_rows=hot_key_rows).df
    t = _epoch_sec(s, time_col)
    return OmigoDF(
        s.groupBy(*_qcs(keys), "session_id")
         .agg(F.min(t).alias("session_start"),
              F.max(t).alias("session_end"),
              (F.max(t) - F.min(t)).alias("duration_sec"),
              F.count(F.lit(1)).alias("n_events")))
