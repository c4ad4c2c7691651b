"""triples stage: canonicalize surfaces, dedup, aggregate provenance,
bucketed Parquet output (W3 + A2 + §4.3 "graph materialize").

- surface → canonical_id mapping applied via the broadcast entity_map
  (vocab-sized; ST7 broadcast pattern — a hash_join fallback exists in
  state/joins.py for an entity map too large to broadcast).
- exact dedup on the normalized key (subject_id, pred, object_id) — the
  W3 analog of the reference's symmetric link-dedup existence check
  (persistence/SegmentDbConnector.py:201-221) — expressed as SALTED
  TWO-PHASE aggregation:
    phase 0: per-batch partial aggregate inside map_batches (a head triple
             occurring 10^6 times in a batch leaves it as ONE row with a
             capped provenance sample);
    phase 1: groupby(key + salt) merges partials per salt bucket;
    phase 2: groupby(key) merges the ≤ S salted rows into the final row.
- provenance = the cfg.prov_cap smallest (url, sent_id) entries (matches
  the sequential oracle exactly: min-k of a union == min-k of min-ks);
  overflow is counted, never silently dropped (prov_overflow column).
- output partitioned by bucket = hash(subject_id) % cfg.output_buckets
  (resumable layout: one directory per bucket).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray

from ..config import KGConfig
from ..functions.hashing import stable_u64

PROV_STRUCT = pa.struct(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("sent_id", pa.int32()),
    ]
)

TRIPLES_SCHEMA = pa.schema(
    [
        pa.field("subject_id", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("object_id", pa.string()),
        pa.field("prov", pa.list_(PROV_STRUCT)),
        pa.field("weight", pa.int64()),
        pa.field("prov_overflow", pa.int64()),
        pa.field("bucket", pa.int32()),
    ]
)

_PARTIAL_SCHEMA = pa.schema(
    [
        pa.field("subject_id", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("object_id", pa.string()),
        pa.field("weight", pa.int64()),
        pa.field("prov_urls", pa.list_(pa.string())),
        pa.field("prov_ts", pa.list_(pa.timestamp("us"))),
        pa.field("prov_sids", pa.list_(pa.int32())),
        pa.field("salt", pa.int32()),
    ]
)


class _PartialAgg:
    """Phase 0: per-batch combine. Canonical-id lookup from the broadcast
    entity map happens here too (once per actor, zero-copy read)."""

    def __init__(self, emap_ref: ray.ObjectRef, cfg: KGConfig):
        self.emap: dict[str, str] = ray.get(emap_ref)
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        agg: dict[tuple[str, str, str], list] = {}
        rows = zip(
            batch["subj"].to_pylist(),
            batch["pred"].to_pylist(),
            batch["obj"].to_pylist(),
            batch["url"].to_pylist(),
            batch["warc_ts"].to_pylist(),
            batch["sent_id"].to_pylist(),
        )
        for subj, pred, obj, url, ts, sid in rows:
            sid_c = self.emap.get(subj, subj)
            oid_c = self.emap.get(obj, obj)
            key = (sid_c, pred, oid_c)
            ent = agg.get(key)
            if ent is None:
                ent = agg[key] = [0, []]  # weight, prov tuples
            ent[0] += 1
            ent[1].append((url, sid, ts))
        cols: dict[str, list] = {n: [] for n in _PARTIAL_SCHEMA.names}
        for (s, p, o), (w, prov) in agg.items():
            prov.sort()
            prov = prov[: cfg.prov_cap]
            cols["subject_id"].append(s)
            cols["pred"].append(p)
            cols["object_id"].append(o)
            cols["weight"].append(w)
            cols["prov_urls"].append([t[0] for t in prov])
            cols["prov_sids"].append([t[1] for t in prov])
            cols["prov_ts"].append([t[2] for t in prov])
            cols["salt"].append(
                stable_u64(prov[0][0], 7) % cfg.lsh_salt_buckets if prov else 0
            )
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], f.type) for f in _PARTIAL_SCHEMA],
            schema=_PARTIAL_SCHEMA,
        )


def _merge_rows(group: pd.DataFrame, cap: int, drop_salt: bool) -> pa.Table:
    """Merge partial rows sharing one (subject_id, pred, object_id) key."""
    prov: list[tuple] = []
    for urls, sids, tss in zip(group["prov_urls"], group["prov_sids"], group["prov_ts"]):
        prov.extend(zip(urls, sids, tss))
    prov.sort()
    prov = prov[:cap]
    cols = {
        "subject_id": [group["subject_id"].iloc[0]],
        "pred": [group["pred"].iloc[0]],
        "object_id": [group["object_id"].iloc[0]],
        "weight": [int(group["weight"].sum())],
        "prov_urls": [[t[0] for t in prov]],
        "prov_ts": [[t[2] for t in prov]],
        "prov_sids": [[t[1] for t in prov]],
        "salt": [int(group["salt"].iloc[0]) if not drop_salt else 0],
    }
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in _PARTIAL_SCHEMA],
        schema=_PARTIAL_SCHEMA,
    )


def _finalize(batch: pa.Table, cfg: KGConfig) -> pa.Table:
    subs = batch["subject_id"].to_pylist()
    preds = batch["pred"].to_pylist()
    objs = batch["object_id"].to_pylist()
    weights = batch["weight"].to_pylist()
    urls = batch["prov_urls"].to_pylist()
    tss = batch["prov_ts"].to_pylist()
    sids = batch["prov_sids"].to_pylist()
    provs = [
        [{"url": u, "warc_ts": t, "sent_id": i} for u, t, i in zip(us, ts_, si)]
        for us, ts_, si in zip(urls, tss, sids)
    ]
    overflow = [w - len(p) for w, p in zip(weights, provs)]
    buckets = [stable_u64(s) % cfg.output_buckets for s in subs]
    return pa.Table.from_arrays(
        [
            pa.array(subs, pa.string()),
            pa.array(preds, pa.string()),
            pa.array(objs, pa.string()),
            pa.array(provs, pa.list_(PROV_STRUCT)),
            pa.array(weights, pa.int64()),
            pa.array(overflow, pa.int64()),
            pa.array(buckets, pa.int32()),
        ],
        schema=TRIPLES_SCHEMA,
    )


def build_triples(triples_raw_ds, emap_ref: ray.ObjectRef, cfg: KGConfig):
    """triples_raw + broadcast entity map → final canonical triples."""
    partial = triples_raw_ds.select_columns(
        ["subj", "pred", "obj", "url", "warc_ts", "sent_id"]
    ).map_batches(
        _PartialAgg,
        fn_constructor_kwargs={"emap_ref": emap_ref, "cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.triple_batch_size,
        concurrency=(1, cfg.actor_pool_size),
        num_cpus=1,
    )
    salted = partial.groupby(["subject_id", "pred", "object_id", "salt"]).map_groups(
        lambda g: _merge_rows(g, cfg.prov_cap, drop_salt=False),
        batch_format="pandas",
    )
    merged = salted.groupby(["subject_id", "pred", "object_id"]).map_groups(
        lambda g: _merge_rows(g, cfg.prov_cap, drop_salt=True),
        batch_format="pandas",
    )
    return merged.map_batches(
        lambda t: _finalize(t, cfg), batch_format="pyarrow", zero_copy_batch=True
    )


def entity_map_to_dict(entity_map_ds) -> dict[str, str]:
    """Collect the (vocab-sized) entity map for broadcast."""
    return {
        r["surface"]: r["canonical_id"]
        for r in entity_map_ds.select_columns(["surface", "canonical_id"]).take_all()
    }
