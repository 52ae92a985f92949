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
    c = ref if ref is not None else F.col(col)
    if dt.startswith("timestamp"):
        return (F.unix_micros(c.cast("timestamp")) / F.lit(1e6))
    return c.cast("double")


def asof_join(left, right, on: list[str] | str, left_time: str,
              right_time: str | None = None, suffix: str = "r",
              tolerance_sec: float | None = None,
              direction: str = "backward",
              tiebreak_cols: list[str] | None = None) -> OmigoDF:
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
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction: {direction}")
    if direction == "nearest":
        return _asof_nearest(left, right, on, left_time, right_time,
                             suffix, tolerance_sec, tiebreak_cols)
    ldf, rdf = _df(left), _df(right)
    keys = [on] if isinstance(on, str) else list(on)
    rt = right_time or left_time

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
    pay_struct = F.struct(*[F.col(c).alias(c) for c in r_payload])
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
    u = l_tagged.select(*cols).unionByName(r_tagged.select(*cols))

    # tiebreak cols order AFTER (__t__, __side__): they only order right
    # rows among themselves (left rows carry NULL payload and sort as a
    # block behind the side tag), so the inclusive same-time semantics
    # are untouched; last() then deterministically picks the max tuple
    w = (Window.partitionBy(*keys).orderBy("__t__", "__side__", *tb)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.select(
        "*",
        F.last("__r__", ignorenulls=True).over(w).alias("__c__"),
        F.last(F.when(F.col("__side__") == 0, F.col("__t__")),
               ignorenulls=True).over(w).alias("__match_t__"))

    out = carried.where(F.col("__side__") == 1)
    if tolerance_sec is not None:
        keep = F.col("__match_t__") >= F.col("__t__") - F.lit(tolerance_sec)
        out = out.withColumn("__c__", F.when(keep, F.col("__c__")))
    proj = keys + [c for c in ldf.columns if c not in keys]
    out = out.select(
        *proj,
        *[F.col("__c__").getField(c).alias(out_names[c]) for c in r_payload])
    return OmigoDF(out)


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
                  tolerance_sec, tiebreak_cols=None) -> OmigoDF:
    """Nearest-match as-of: both directional carries over ONE union —
    the backward and forward windows share the hash partitioning (one
    Exchange, two Sorts) — then a map-side pick of the closer match
    (ties prefer the backward/earlier row, pandas merge_asof style)."""
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
    pay_struct = F.struct(*[F.col(c).alias(c) for c in r_payload])
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
    u = l_tagged.select(*cols).unionByName(r_tagged.select(*cols))

    frame = (Window.unboundedPreceding, Window.currentRow)
    # tiebreak ASC in BOTH windows: among equal-time right rows, last()
    # picks the max tiebreak tuple in each direction, so the backward
    # and forward carries agree on the winner of a tie
    wb = (Window.partitionBy(*keys).orderBy("__t__", "__side__", *tb)
          .rowsBetween(*frame))
    wf = (Window.partitionBy(*keys)
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
    if tolerance_sec is not None:
        b_ok = F.col("__bt__").isNotNull() & (bd <= F.lit(tolerance_sec))
        f_ok = F.col("__ft__").isNotNull() & (fd <= F.lit(tolerance_sec))
    else:
        b_ok = F.col("__bt__").isNotNull()
        f_ok = F.col("__ft__").isNotNull()
    use_b = b_ok & (~f_ok | (bd <= fd))   # tie -> backward
    proj = keys + [c for c in ldf.columns if c not in keys]
    pick = F.when(use_b, F.col("__b__")).when(f_ok, F.col("__f__"))
    out = carried.select(
        *proj,
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

    p = pdf.withColumn(
        "__bin__", F.floor(_epoch_sec(pdf, point_col) / bin_width))
    i = idf.withColumn(
        "__bin__",
        F.explode(F.sequence(
            F.floor(_epoch_sec(idf, start_col) / bin_width),
            F.floor(_epoch_sec(idf, end_col) / bin_width))))

    cond = [p["__bin__"] == i["__bin__"]]
    for k in keys:
        cond.append(p[k] == i[k])
    # dataframe-qualified refs: the equi-keys exist on both join sides
    pt = _epoch_sec(pdf, point_col, p[point_col])
    cond.append(pt >= _epoch_sec(idf, start_col, i[start_col]))
    cond.append(pt <= _epoch_sec(idf, end_col, i[end_col]))
    joined = p.join(i, cond, how)
    dup = set(keys) | {"__bin__"}
    out = joined.select(
        *[p[c] for c in pdf.columns],
        *[i[c] for c in idf.columns if c not in dup])
    return OmigoDF(out.drop("__bin__"))


def sessionize(odf, key_cols: list[str] | str, time_col: str,
               gap_sec: float = 1800.0,
               session_col: str = "session_id") -> OmigoDF:
    """Assign gap-based session numbers per key: a new session starts
    whenever the time since the previous event exceeds ``gap_sec``.
    Adds ``{session_col}`` (1-based per key) — one shuffle on the key,
    both window functions share the same sort order.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    d = _df(odf)
    t: Column = _epoch_sec(d, time_col)
    w = Window.partitionBy(*keys).orderBy(t)
    is_break = (t - F.lag(t).over(w) > F.lit(gap_sec)).cast("bigint")
    out = (d.withColumn("__brk__", F.coalesce(is_break, F.lit(0)))
           .withColumn(session_col,
                       (F.sum("__brk__").over(
                           w.rowsBetween(Window.unboundedPreceding,
                                         Window.currentRow)) + 1))
           .drop("__brk__"))
    return OmigoDF(out)


def rolling_aggregate(odf, key_cols: list[str] | str, order_col: str,
                      agg_cols, agg_funcs, window_rows: int = 5,
                      precision: int = 6,
                      tiebreak_cols: list[str] | None = None) -> OmigoDF:
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
    default None the caller asserts the order is already total."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    d = _df(odf)
    order = [_epoch_sec(d, order_col)] + [
        F.col(c) for c in (tiebreak_cols or [])]
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(-(window_rows - 1), Window.currentRow))
    out = d
    for c, fn in zip(list(agg_cols), list(agg_funcs)):
        x = F.col(c).try_cast("double")
        xd = F.col(c).try_cast("decimal(28,8)")
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
        out = out.withColumn(f"{c}:rolling_{fn}", expr)
    return OmigoDF(out)


def merge_intervals(odf, key_cols: list[str] | str, start_col: str,
                    end_col: str) -> OmigoDF:
    """Union overlapping/touching [start, end] intervals per key into
    maximal disjoint islands (gaps-and-islands): one output row per
    island with its bounds and member count.

    Window plan: order intervals by (start, end), carry the running max
    end; an island starts where start > max(previous ends); the island
    number is the running sum of those breaks. Both windows and the
    final collapse share one hash partitioning on the key."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    d = _df(odf)
    s = F.col(start_col).cast("double")
    e = F.col(end_col).cast("double")
    w = Window.partitionBy(*keys).orderBy(s, e)
    prev_max_end = F.max(e).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    brk = (F.when(prev_max_end.isNull() | (s > prev_max_end), 1)
           .otherwise(0))
    tagged = (d.withColumn("__brk__", brk)
              .withColumn("__island__",
                          F.sum("__brk__").over(
                              w.rowsBetween(Window.unboundedPreceding,
                                            Window.currentRow)))
              .drop("__brk__"))
    return OmigoDF(
        tagged.groupBy(*keys, "__island__")
        .agg(F.min(s).alias("island_start"),
             F.max(e).alias("island_end"),
             F.count(F.lit(1)).alias("n_intervals"))
        .withColumnRenamed("__island__", "island_id"))


def session_stats(odf, key_cols: list[str] | str, time_col: str,
                  gap_sec: float = 1800.0) -> OmigoDF:
    """Sessionize then collapse: one row per (key, session) with start,
    end, duration and event count. The groupBy re-uses the sessionize
    shuffle keys, so AQE keeps the second exchange local."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    s = sessionize(odf, keys, time_col, gap_sec).df
    t = _epoch_sec(s, time_col)
    return OmigoDF(
        s.groupBy(*keys, "session_id")
         .agg(F.min(t).alias("session_start"),
              F.max(t).alias("session_end"),
              (F.max(t) - F.min(t)).alias("duration_sec"),
              F.count(F.lit(1)).alias("n_events")))
