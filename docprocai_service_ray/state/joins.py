"""Join / lookup strategies (SURVEY.md §2.4 J1–J7).

Three tiers, chosen by the *size of the small side*, never by row count of
the big side:

- ``broadcast_ref`` + ``lookup inside map_batches``: the small side
  (alias dictionary, entity map, dup-url winners) is ``ray.put`` ONCE and
  read in each actor's ``__init__`` / each task's first batch — never
  re-shipped per batch. This is the ST7 pattern (SURVEY.md §2.3) and
  replaces the reference's per-query candidate fetch
  (service/DocProcAiService.py:670-680).
- ``semi_join_filter`` / ``anti_join_filter``: broadcast key set, filter
  inside map_batches (J4/J5 analogs, SegmentDbConnector.py:235-252 and
  DocProcAiService.py:616-637).
- ``hash_join``: both sides large → explicit partitioned hash join:
  add ``bucket = hash(key) % B`` to both sides, union with a side tag,
  ``groupby(bucket)`` co-locates, pandas merge per bucket. B is sized
  from a METADATA-ONLY input-bytes estimate (never by executing the
  inputs) targeting ~64 MB per bucket; ``salt=k`` splits each left key
  into k sub-keys and replicates the right side k ways for skewed keys.
"""

from __future__ import annotations

from typing import Any, Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions.hashing import stable_u64


def broadcast_ref(obj: Any) -> ray.ObjectRef:
    """Put a small side into the object store once (zero-copy reads)."""
    return ray.put(obj)


_TARGET_BUCKET_BYTES = 64 << 20  # ~64 MB of input per merge task


def _meta_size_bytes(ds) -> int | None:
    """Metadata-only size estimate: the dataset's own inferred size if
    known (reads, materialized datasets), else the sum over its logical
    input dependencies (maps usually shrink their input, so this is an
    upper-bound-ish estimate). NEVER executes the dataset."""

    def walk(op) -> int | None:
        try:
            s = op.infer_metadata().size_bytes
        except Exception:
            return None
        if s is not None:
            return s
        deps = getattr(op, "input_dependencies", None)
        if not deps:
            return None
        tot = 0
        for d in deps:
            ds_ = walk(d)
            if ds_ is None:
                return None
            tot += ds_
        return tot

    try:
        return walk(ds._logical_plan.dag)
    except Exception:
        return None


def auto_buckets(*datasets, default: int = 32, lo: int = 8, hi: int = 4096) -> int:
    """Bucket count targeting ~64 MB of estimated input per bucket; falls
    back to ``default`` when no metadata estimate exists. Scales with data
    volume so a 100× corpus gets 100× merge tasks, not 100× task size."""
    total = 0
    for ds in datasets:
        s = _meta_size_bytes(ds)
        if s is None:
            return default
        total += s
    return min(hi, max(lo, (total // _TARGET_BUCKET_BYTES) + 1))


def collect_broadcast_df(ds, columns: list[str], *,
                         max_bytes: int = 256 << 20):
    """Size-gated driver collect for a BROADCAST side (dimension tables):
    prunes to ``columns`` first, then raises LOUDLY when the metadata-only
    size estimate exceeds ``max_bytes`` instead of OOMing the driver — a
    caller above the gate should ride :func:`hash_join`'s partitioned tier
    instead. Same gate discipline as ``emap_broadcast_max_bytes`` /
    ``winners_broadcast_max`` / ``asof_join.max_partition_rows``."""
    from .groupby import collect_pandas

    pruned = ds.select_columns(columns)
    # upper-bound-ish estimate (full input size when projection pushdown
    # isn't reflected in metadata) — a dim that trips it was never a
    # broadcast candidate anyway
    sz = _meta_size_bytes(pruned)
    if sz is not None and sz > max_bytes:
        raise ValueError(
            f"broadcast side is ~{sz >> 20} MiB (> {max_bytes >> 20} MiB "
            "gate) — too large for a driver collect + ray.put broadcast; "
            "use hash_join's partitioned tier instead"
        )
    return collect_pandas(pruned, columns)


def _key_array_once(keys_ref: ray.ObjectRef):
    """Per-task memo of the broadcast key set as a pyarrow Array — built
    on the first batch a task sees, reused for every later batch
    (ADVICE/VERDICT r4 nit: never pa.array(list(keys)) per batch)."""
    cache: dict = {}

    def get() -> pa.Array:
        arr = cache.get("arr")
        if arr is None:
            arr = cache["arr"] = pa.array(list(ray.get(keys_ref)))
        return arr

    return get


def semi_join_filter(ds, column: str, keys_ref: ray.ObjectRef):
    """Keep rows whose ``column`` value is in the broadcast key set."""
    key_arr = _key_array_once(keys_ref)

    def _filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch[column], key_arr()))

    return ds.map_batches(_filter, batch_format="pyarrow")


def anti_join_filter(ds, column: str, keys_ref: ray.ObjectRef):
    """Drop rows whose ``column`` value is in the broadcast key set."""
    key_arr = _key_array_once(keys_ref)

    def _filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.invert(pc.is_in(batch[column], key_arr()))
        )

    return ds.map_batches(_filter, batch_format="pyarrow")


_BROADCAST_MAX_BYTES = 64 << 20  # small-side cap for the map-side join tier


def _collect_arrow(ds) -> pa.Table:
    """Materialize a (small, size-gated) Dataset as one Arrow table on the
    driver — only ever called under ``_BROADCAST_MAX_BYTES``."""
    tables = ray.get(ds.to_arrow_refs())
    # to_arrow_refs hands back raw block refs; blocks that materialized as
    # pandas (block format after groupby/sort is execution-dependent) arrive
    # as DataFrames and must be converted before concat.
    tables = [
        t if isinstance(t, pa.Table) else pa.Table.from_pandas(t, preserve_index=False)
        for t in tables
    ]
    if not tables:
        return pa.Table.from_pylist([], schema=ds.schema().base_schema)
    return pa.concat_tables(tables, promote_options="default").combine_chunks()


def _broadcast_join(left, right, keys: list[str], *, how: str,
                    suffixes: tuple[str, str]):
    """Map-side join: the right side is collected once (≤ the broadcast
    cap), ``ray.put`` once, and every left batch runs a vectorized
    ``pyarrow.Table.join`` against it — ZERO shuffle, no repartitioning
    of the big side. The analog of Spark's auto-broadcast tier."""
    l_cols = left.schema().names
    r_tbl = _collect_arrow(right)
    rename = {
        c: c + suffixes[1]
        for c in r_tbl.schema.names
        if c in l_cols and c not in keys
    }
    if rename:
        r_tbl = r_tbl.rename_columns(
            [rename.get(c, c) for c in r_tbl.schema.names]
        )
    # harmonize key dtypes with the left side (pa.Table.join is strict);
    # left may be pandas-blocked, in which case the first batch casts
    l_schema = left.schema().base_schema
    if isinstance(l_schema, pa.Schema):
        for k in keys:
            lt = l_schema.field(k).type
            if r_tbl.schema.field(k).type != lt:
                r_tbl = r_tbl.set_column(
                    r_tbl.schema.get_field_index(k), k, r_tbl[k].cast(lt)
                )
    r_ref = ray.put(r_tbl)
    join_type = {"inner": "inner", "left": "left outer"}[how]

    def _join(batch: pa.Table) -> pa.Table:
        r = ray.get(r_ref)
        for k in keys:  # per-batch key-type harmonization (pandas blocks)
            if batch.schema.field(k).type != r.schema.field(k).type:
                batch = batch.set_column(
                    batch.schema.get_field_index(k), k,
                    batch[k].cast(r.schema.field(k).type),
                )
        return batch.join(r, keys=keys, join_type=join_type)

    # batch_size=None → one call per BLOCK: pa.Table.join rebuilds the
    # right-side hash table per call, so row-sized batches would pay that
    # build hundreds of times per block
    return left.map_batches(
        _join, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def _bloom_key_hash(df: pd.DataFrame, keys: list[str]) -> np.ndarray:
    """uint64 hash of the composite key — SAME composite the bucket tag
    uses, via the process-stable pandas hash."""
    key0 = df[keys[0]].astype(str)
    for k in keys[1:]:
        key0 = key0 + "\x1f" + df[k].astype(str)
    return pd.util.hash_pandas_object(key0, index=False).to_numpy(dtype=np.uint64)


def build_key_bloom(ds, keys: list[str], *, bits: int = 1 << 23,
                    n_hashes: int = 6) -> bytes:
    """Bloom filter over ``ds``'s key column(s): per-block partial bitmaps
    (one ``bits/8``-byte row per block, OR-merged 8-way before the driver
    sees them). Double hashing h1 + i*h2 from one vectorized pandas-hash
    pass. Default 1 MiB bitmap ≈ 1% false positives at ~800k distinct keys
    (fp ≈ (1-e^{-kn/m})^k); size ``bits`` up for bigger key domains —
    false positives only cost shuffle bytes, never correctness."""
    nbytes = bits // 8

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bm = np.zeros(nbytes, dtype=np.uint8)
        if len(df):
            h1 = _bloom_key_hash(df, keys)
            h2 = (h1 * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
            for i in range(n_hashes):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(bits)
                np.bitwise_or.at(
                    bm, (pos >> 3).astype(np.int64),
                    np.left_shift(1, (pos & np.uint64(7)).astype(np.uint8)).astype(np.uint8),
                )
        return pd.DataFrame({"bloom": [bm.tobytes()]})

    def or_merge(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(nbytes, dtype=np.uint8)
        for payload in df["bloom"]:
            acc |= np.frombuffer(payload, dtype=np.uint8)
        return pd.DataFrame({"bloom": [acc.tobytes()]})

    parts = (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .repartition(8)
        .map_batches(or_merge, batch_format="pandas")
        .take_all()
    )
    acc = np.zeros(nbytes, dtype=np.uint8)
    for row in parts:
        acc |= np.frombuffer(row["bloom"], dtype=np.uint8)
    return acc.tobytes()


def bloom_filter_batches(ds, keys: list[str], bloom_ref: ray.ObjectRef, *,
                         bits: int, n_hashes: int = 6):
    """Keep only rows whose key MIGHT be in the bloom (no false negatives)."""

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        bm = np.frombuffer(ray.get(bloom_ref), dtype=np.uint8)
        h1 = _bloom_key_hash(df, keys)
        h2 = (h1 * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
        ok = np.ones(len(df), dtype=bool)
        for i in range(n_hashes):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(bits)
            bit = np.left_shift(1, (pos & np.uint64(7)).astype(np.uint8)).astype(np.uint8)
            ok &= (bm[(pos >> 3).astype(np.int64)] & bit) != 0
        return df[ok]

    return ds.map_batches(keep, batch_format="pandas")


def hash_join(
    left,
    right,
    on: str | list[str],
    *,
    buckets: int | None = None,
    how: str = "inner",
    seed: int = 0,
    suffixes: tuple[str, str] = ("", "_r"),
    salt: int = 1,
    strategy: str = "auto",
    broadcast_max_bytes: int = _BROADCAST_MAX_BYTES,
    bloom_prefilter: bool = False,
    bloom_bits: int = 1 << 23,
):
    """Partitioned hash join of two Datasets on ``on``.

    ``strategy="auto"`` picks the tier by the size of the SMALL side, never
    the big side: when the right side's metadata-only byte estimate fits
    ``broadcast_max_bytes``, it is broadcast once and every left batch does
    a map-side ``pyarrow.Table.join`` — zero shuffle (the dominant case
    for dimension tables, label maps, dup winners). Otherwise (or with
    ``strategy="shuffle"``) the general both-sides-large path runs: both
    sides get a ``__bucket`` column from a stable hash of the key, are
    unioned with a ``__side`` tag, and ``groupby(__bucket)`` brings
    matching keys together; a pandas merge runs per bucket. One all-to-all
    exchange total; no driver materialization.

    ``buckets=None`` auto-sizes from a metadata-only input-bytes estimate
    (~64 MB per bucket). ``salt=k`` defuses skewed keys: each LEFT row gets
    a deterministic sub-key in [0, k) and the RIGHT side is replicated k
    ways, so a head key's rows spread over k merge tasks instead of one
    straggler (right side should be the smaller side when salting; salting
    forces the shuffle tier).

    ``bloom_prefilter=True`` (inner shuffle joins): a Bloom filter over the
    right side's keys is built first (per-block partials, OR-merged; the
    right pipeline executes an extra time for this pass) and broadcast, and
    left rows that cannot match are dropped BEFORE the exchange — Spark's
    runtime row-level filtering analog. Exactness is preserved (Bloom false
    positives still meet the real merge); the win is shuffle bytes, so use
    it when the left side dominates the exchange and the join is selective.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how == "outer":
        # full outer CANNOT broadcast (a map-side join would re-emit each
        # unmatched right row once per left batch) and CANNOT salt (right
        # replication would duplicate unmatched right rows salt times)
        if strategy == "broadcast" or salt > 1:
            raise ValueError("how='outer' requires the shuffle tier with salt=1")
        strategy = "shuffle"
    if strategy == "auto" and salt == 1 and how in ("inner", "left"):
        rb = _meta_size_bytes(right)
        if rb is not None and rb <= broadcast_max_bytes:
            strategy = "broadcast"
    if strategy == "broadcast":
        return _broadcast_join(left, right, keys, how=how, suffixes=suffixes)
    if buckets is None:
        buckets = auto_buckets(left, right)
    # column + bucket metadata comes from the UNFILTERED left (the bloom
    # filter keeps the schema but hides it from metadata-only inference;
    # its byte estimate would also undersize the buckets)
    l_cols = left.schema().names
    r_cols = right.schema().names
    if bloom_prefilter and how == "inner":
        bloom_ref = ray.put(build_key_bloom(right, keys, bits=bloom_bits))
        left = bloom_filter_batches(left, keys, bloom_ref, bits=bloom_bits)
    # overlapping non-key columns on the right get the suffix up front so the
    # two sides can share one unioned schema
    rename = {c: c + suffixes[1] for c in r_cols if c in l_cols and c not in keys}
    r_cols_final = [rename.get(c, c) for c in r_cols]
    r_only = [c for c in r_cols_final if c not in l_cols]
    superset = l_cols + r_only
    merge_keys = keys + (["__salt"] if salt > 1 else [])

    def _tag(side: str):
        def _fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            if side == "r" and rename:
                batch = batch.rename(columns=rename)
            for c in superset:
                if c not in batch.columns:
                    batch[c] = None
            batch = batch[superset]
            if salt > 1:
                if side == "l":
                    # deterministic per-row sub-key (full-row hash, stable
                    # across runs/processes — never random)
                    rh = pd.util.hash_pandas_object(batch, index=False)
                    batch["__salt"] = (rh % salt).astype("int64")
                else:
                    # replicate the right side once per sub-key
                    batch = pd.concat(
                        [batch.assign(__salt=np.int64(s)) for s in range(salt)],
                        ignore_index=True,
                    )
            key0 = batch[keys[0]].astype(str)
            for k in keys[1:]:
                key0 = key0 + "\x1f" + batch[k].astype(str)
            if salt > 1:
                key0 = key0 + "\x1f" + batch["__salt"].astype(str)
            h = pd.util.hash_pandas_object(key0, index=False)  # vectorized, stable
            batch["__bucket"] = ((h + np.uint64(seed)) % buckets).astype("int64")
            batch["__side"] = side
            return batch

        return _fn

    lt = left.map_batches(_tag("l"), batch_format="pandas")
    rt = right.map_batches(_tag("r"), batch_format="pandas")
    both = lt.union(rt)
    l_side_cols = l_cols + (["__salt"] if salt > 1 else [])
    r_side_cols = merge_keys + r_only

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["__side"] == "l"][l_side_cols]
        r = group[group["__side"] == "r"][r_side_cols]
        out = l.merge(r, on=merge_keys, how=how)
        return out.drop(columns="__salt") if salt > 1 else out

    return both.groupby("__bucket").map_groups(_merge, batch_format="pandas")


def _broadcast_asof(left, right, *, by: str, on: str, right_on: str,
                    direction: str, right_reduce=None):
    """Map-side as-of: right side collected (size-gated), renamed,
    time-sorted once; every left batch sorts itself and merge_asofs
    against the broadcast table."""
    l_cols = left.schema().names
    r_tbl = _collect_arrow(right)
    rename = {c: c + "_r" for c in r_tbl.schema.names if c in l_cols and c != by}
    if rename:
        r_tbl = r_tbl.rename_columns([rename.get(c, c) for c in r_tbl.schema.names])
    right_on_final = rename.get(right_on, right_on)
    r_df = r_tbl.to_pandas()
    if right_reduce is not None:
        r_df = right_reduce(r_df)
    r_df[right_on_final] = pd.to_datetime(r_df[right_on_final]).astype("datetime64[us]")
    r_df = r_df.sort_values(right_on_final, kind="stable").reset_index(drop=True)
    r_ref = ray.put(r_df)
    r_extra = [c for c in r_df.columns if c not in l_cols and c != by]

    def _merge(batch: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(r_ref)
        l = batch.copy()
        l[on] = pd.to_datetime(l[on]).astype("datetime64[us]")
        l = l.sort_values(on, kind="stable")
        if r.empty:
            return l.assign(**{c: None for c in r_extra})
        return pd.merge_asof(
            l, r, left_on=on, right_on=right_on_final, by=by, direction=direction,
        )

    return left.map_batches(_merge, batch_format="pandas", batch_size=None)


def asof_join(
    left,
    right,
    *,
    by: str,
    on: str,
    right_on: str | None = None,
    direction: str = "backward",
    num_partitions: int | None = None,
    strategy: str = "auto",
    broadcast_max_bytes: int = _BROADCAST_MAX_BYTES,
    right_reduce=None,
    max_partition_rows: int = 20_000_000,
):
    """As-of join (custom operator — Ray Data has no native equivalent;
    SURVEY-mandated composition (a): union + groupby + per-group
    ``pd.merge_asof``).

    Partitioning assumption (documented per the custom-operator rule): all
    rows of one ``by`` key land in one hash partition (keys are users /
    entities with bounded history — by-key salting is impossible for as-of
    semantics, so a single key hotter than one partition's memory needs a
    time-bucketed pre-aggregation upstream). ``num_partitions=None``
    auto-sizes from a metadata-only input-bytes estimate. Both sides are
    tagged, unioned and grouped by ``hash(by) % P`` in ONE shuffle; within
    a partition a single vectorized ``pd.merge_asof(by=...)`` handles
    every key at once — never one Python call per key.

    Broadcast tier (``strategy="auto"``): as-of only needs the RIGHT side
    complete per key — the left can arrive in arbitrary chunks. So when
    the right side's metadata byte estimate fits the broadcast cap, it is
    collected + time-sorted ONCE, ``ray.put`` once, and each left batch
    runs ``pd.merge_asof`` against it directly — zero shuffle of the big
    (event) side.

    ``right_reduce`` (optional): a vectorized grouped FINAL reduce for a
    right side that arrives as per-batch partials (e.g. max price per
    (key, time)). Applied once on the collected table in the broadcast
    tier, per partition in the shuffle tier — the caller then needs no
    separate pre-join shuffle of the right side at all.
    """
    right_on = right_on or on
    if strategy == "auto" and num_partitions is None:
        rb = _meta_size_bytes(right)
        if rb is not None and rb <= broadcast_max_bytes:
            strategy = "broadcast"
    if strategy == "broadcast":
        return _broadcast_asof(
            left, right, by=by, on=on, right_on=right_on, direction=direction,
            right_reduce=right_reduce,
        )
    if num_partitions is None:
        num_partitions = auto_buckets(left, right)
    l_cols = left.schema().names
    r_cols = right.schema().names
    rename = {c: c + "_r" for c in r_cols if c in l_cols and c != by}
    r_cols_final = [rename.get(c, c) for c in r_cols]
    superset = l_cols + [c for c in r_cols_final if c not in l_cols]
    right_on_final = rename.get(right_on, right_on)

    def _tag(side: str):
        def _fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            if side == "r" and rename:
                batch = batch.rename(columns=rename)
            for c in superset:
                if c not in batch.columns:
                    batch[c] = None
            batch = batch[superset]
            batch["__side"] = side
            h = pd.util.hash_pandas_object(batch[by].astype(str), index=False)
            batch["__part"] = (h % num_partitions).astype("int64")
            return batch

        return _fn

    both = left.map_batches(_tag("l"), batch_format="pandas").union(
        right.map_batches(_tag("r"), batch_format="pandas")
    )
    r_side_cols = [by] + [c for c in r_cols_final if c not in l_cols]

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) > max_partition_rows:
            # enforce the documented single-partition-per-key memory
            # contract LOUDLY instead of letting pandas OOM: name the
            # hottest keys so the caller knows what to pre-aggregate
            hot = group[by].value_counts().head(3)
            raise ValueError(
                f"asof_join partition exceeds max_partition_rows="
                f"{max_partition_rows} ({len(group)} rows); hottest {by} "
                f"keys: {hot.to_dict()} — pre-aggregate these upstream "
                f"(e.g. time-bucketed right_reduce) or raise the bound"
            )
        group = group.drop(columns="__part")
        l = group[group["__side"] == "l"][l_cols]
        r = group[group["__side"] == "r"][r_side_cols]
        if right_reduce is not None and not r.empty:
            r = right_reduce(r)
        if l.empty:
            return l.assign(
                **{c: pd.Series(dtype=r[c].dtype) for c in r_side_cols if c != by}
            )
        if r.empty:
            # left rows with no right side keep merge_asof's left-join
            # semantics: null-filled right columns
            return l.assign(**{c: None for c in r_side_cols if c != by})
        l = l.copy()
        r = r.copy()
        l[on] = pd.to_datetime(l[on]).astype("datetime64[us]")
        r[right_on_final] = pd.to_datetime(r[right_on_final]).astype("datetime64[us]")
        l = l.sort_values(on, kind="stable")
        r = r.sort_values(right_on_final, kind="stable")
        return pd.merge_asof(
            l, r, left_on=on, right_on=right_on_final, by=by, direction=direction,
        )

    return both.groupby("__part").map_groups(_merge, batch_format="pandas")


def _axis_raw(s: pd.Series) -> np.ndarray:
    """Join-axis values for the band predicate: datetime64 → epoch-ns
    int64; numeric dtypes are kept AS IS (floats are never truncated —
    the band compares exact raw values)."""
    if np.issubdtype(s.dtype, np.datetime64):
        return s.astype("datetime64[ns]").astype("int64").to_numpy()
    return s.to_numpy()


def _bucket_floor(vals: np.ndarray, width) -> np.ndarray:
    """floor(v / width) as int64 bucket ids — true floor for negative and
    float values (``astype(int64)`` truncates toward zero, which mis-tags
    e.g. t=-0.5 into bucket 0 instead of -1)."""
    if np.issubdtype(vals.dtype, np.floating) or isinstance(width, float):
        return np.floor(vals / float(width)).astype(np.int64)
    return vals.astype(np.int64) // int(width)


def interval_join(left, right, *, on: str, right_start: str, right_end: str,
                  by: list[str] | None = None, bucket_width,
                  strategy: str = "auto", suffixes=("", "_r")):
    """Point-in-interval join: each left row (point ``on`` = t) matched to
    every right row whose half-open interval satisfies
    ``right_start <= t < right_end``, with an optional equality prefix
    ``by`` — the inequality-join shape (sessions × maintenance windows,
    events × promo periods) that neither hash nor as-of joins express.

    Distributed via time-bucket replication: the axis is bucketed at
    ``bucket_width`` (a number, or ``pd.Timedelta`` for timestamps); each
    RIGHT interval is replicated to every bucket it overlaps while each
    LEFT point carries exactly ONE bucket tag, so every matching pair
    meets in exactly one bucket — no dedup pass. The bucketed equality
    join then rides :func:`hash_join`'s auto tier (broadcast small side /
    partitioned shuffle), and the band predicate is applied vectorized
    inside the result batches.

    Scale contract: replication per interval is
    ``ceil(interval_len / bucket_width) + 1`` copies — pick a width on the
    order of the typical interval length so the right side grows O(1)-fold.
    Degenerate (empty/negative) intervals replicate zero times and match
    nothing.
    """
    if isinstance(bucket_width, (int, np.integer)):
        width: int | float = int(bucket_width)
    elif isinstance(bucket_width, float):
        width = float(bucket_width)  # float axes take float widths
    else:
        width = int(pd.Timedelta(bucket_width).value)
    if width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    by = by or []

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__tb"] = _bucket_floor(_axis_raw(df[on]), width)
        return df

    def explode_right(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            out = df.copy()
            out["__tb"] = pd.Series([], dtype="int64")
            return out
        a0, a1 = _axis_raw(df[right_start]), _axis_raw(df[right_end])
        b0 = _bucket_floor(a0, width)
        if np.issubdtype(a1.dtype, np.floating) or isinstance(width, float):
            # exclusive end on a float axis: last covered bucket is
            # ceil(end/width)-1 (an end exactly on a boundary k*width
            # covers only up to bucket k-1)
            b1 = np.ceil(a1 / float(width)).astype(np.int64) - 1
        else:
            b1 = (a1.astype(np.int64) - 1) // int(width)
        reps = np.maximum(b1 - b0 + 1, 0)
        out = df.iloc[np.repeat(np.arange(len(df)), reps)].copy()
        offs = np.concatenate(([0], np.cumsum(reps)))[:-1]
        out["__tb"] = np.repeat(b0, reps) + (
            np.arange(int(reps.sum())) - np.repeat(offs, reps)
        )
        return out

    joined = hash_join(
        left.map_batches(tag_left, batch_format="pandas"),
        right.map_batches(explode_right, batch_format="pandas"),
        on=[*by, "__tb"],
        strategy=strategy,
        suffixes=suffixes,
    )

    def band(df: pd.DataFrame) -> pd.DataFrame:
        # exact raw-value comparison (floats included) — only the bucket
        # tags above use the int64 view
        t = _axis_raw(df[on])
        keep = (_axis_raw(df[right_start]) <= t) & (t < _axis_raw(df[right_end]))
        return df[keep].drop(columns="__tb")

    return joined.map_batches(band, batch_format="pandas")
